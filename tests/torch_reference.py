"""Torch fixtures implementing the reference models' *behavioral contracts*
for parity testing (test-only; the framework itself never imports torch).

These re-state the contracts documented in SURVEY.md §2 using plain torch
modules; golden values produced here pin our JAX implementations.
"""

import math

import torch
from torch import nn
import torch.nn.functional as F


class TorchMLP(nn.Module):
    """fc1 -> gelu -> fc2 (reference blocks.py:74-84)."""

    def __init__(self, hidden_dim, mlp_dim):
        super().__init__()
        self.fc1 = nn.Linear(hidden_dim, mlp_dim)
        self.fc2 = nn.Linear(mlp_dim, hidden_dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TorchViTBlock(nn.Module):
    """pre-LN block (reference vit.py:19-55), eps configurable (§7.12)."""

    def __init__(self, num_heads, hidden_dim, mlp_dim, eps=1e-5):
        super().__init__()
        self.ln_1 = nn.LayerNorm(hidden_dim, eps=eps)
        self.self_attention = nn.MultiheadAttention(hidden_dim, num_heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(hidden_dim, eps=eps)
        self.mlp = TorchMLP(hidden_dim, mlp_dim)

    def forward(self, x):
        y, _ = self.self_attention(self.ln_1(x), self.ln_1(x), self.ln_1(x))
        x = x + y
        return x + self.mlp(self.ln_2(x))


class TorchViT(nn.Module):
    """Plain ViT matching reference vit.py:100-248 (no dropout paths)."""

    def __init__(self, image_size, patch_size, num_layers, num_heads, hidden_dim,
                 mlp_dim, num_classes, num_class_tokens=1, num_registers=0):
        super().__init__()
        self.patch_size = patch_size
        self.hidden_dim = hidden_dim
        self.num_class_tokens = num_class_tokens
        self.num_registers = num_registers
        self.conv_proj = nn.Conv2d(3, hidden_dim, kernel_size=patch_size, stride=patch_size)
        seq = (image_size // patch_size) ** 2 + num_class_tokens + num_registers
        self.class_tokens = nn.Parameter(torch.zeros(1, num_class_tokens, hidden_dim))
        if num_registers:
            self.register_tokens = nn.Parameter(torch.zeros(1, num_registers, hidden_dim))
        self.pos_embedding = nn.Parameter(torch.randn(1, seq, hidden_dim) * 0.02)
        self.layers = nn.ModuleList(
            [TorchViTBlock(num_heads, hidden_dim, mlp_dim) for _ in range(num_layers)]
        )
        self.ln = nn.LayerNorm(hidden_dim)
        self.head = nn.Linear(hidden_dim, num_classes)
        nn.init.zeros_(self.head.weight)
        nn.init.zeros_(self.head.bias)
        # randomize non-zero-init weights deterministically for parity value
        fan_in = 3 * patch_size * patch_size
        nn.init.trunc_normal_(self.conv_proj.weight, std=math.sqrt(1 / fan_in))
        nn.init.zeros_(self.conv_proj.bias)

    def forward(self, x):
        n = x.shape[0]
        x = self.conv_proj(x).reshape(n, self.hidden_dim, -1).permute(0, 2, 1)
        if self.num_registers:
            x = torch.cat([self.register_tokens.expand(n, -1, -1), x], dim=1)
        x = torch.cat([self.class_tokens.expand(n, -1, -1), x], dim=1)
        x = x + self.pos_embedding
        for blk in self.layers:
            x = blk(x)
        x = self.ln(x)
        x = x[:, : self.num_class_tokens].sum(dim=1)
        return self.head(x)

    def peekvit_state_dict(self):
        """Emit keys in the reference's peekvit grammar for the adapter."""
        sd = {}
        sd["conv_proj.weight"] = self.conv_proj.weight
        sd["conv_proj.bias"] = self.conv_proj.bias
        sd["class_tokens"] = self.class_tokens
        if self.num_registers:
            sd["register_tokens"] = self.register_tokens
        sd["encoder.pos_embedding"] = self.pos_embedding
        for i, blk in enumerate(self.layers):
            p = f"encoder.layers.{i}"
            sd[f"{p}.ln_1.weight"] = blk.ln_1.weight
            sd[f"{p}.ln_1.bias"] = blk.ln_1.bias
            sd[f"{p}.self_attention.self_attention.in_proj_weight"] = blk.self_attention.in_proj_weight
            sd[f"{p}.self_attention.self_attention.in_proj_bias"] = blk.self_attention.in_proj_bias
            sd[f"{p}.self_attention.self_attention.out_proj.weight"] = blk.self_attention.out_proj.weight
            sd[f"{p}.self_attention.self_attention.out_proj.bias"] = blk.self_attention.out_proj.bias
            sd[f"{p}.ln_2.weight"] = blk.ln_2.weight
            sd[f"{p}.ln_2.bias"] = blk.ln_2.bias
            sd[f"{p}.mlp.fc1.weight"] = blk.mlp.fc1.weight
            sd[f"{p}.mlp.fc1.bias"] = blk.mlp.fc1.bias
            sd[f"{p}.mlp.fc2.weight"] = blk.mlp.fc2.weight
            sd[f"{p}.mlp.fc2.bias"] = blk.mlp.fc2.bias
        sd["encoder.ln.weight"] = self.ln.weight
        sd["encoder.ln.bias"] = self.ln.bias
        sd["head.weight"] = self.head.weight
        sd["head.bias"] = self.head.bias
        return {k: v.detach() for k, v in sd.items()}


class TorchRankViTBlock(TorchViTBlock):
    """sort_and_drop + block (reference rankvit.py:24-101), 1 class token."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.current_budget = 1.0

    def sort_and_drop(self, x):
        class_token = x[:, 0:1, :]
        x = x[:, 1:, :]
        mags = torch.norm(x, dim=-1)
        idx = torch.argsort(mags, dim=-1, descending=True, stable=True).unsqueeze(-1)
        x = torch.gather(x, 1, idx.expand(-1, -1, x.shape[-1]))
        num_keep = math.ceil(x.shape[1] * self.current_budget)
        return torch.cat([class_token, x[:, :num_keep]], dim=1)

    def forward(self, x):
        if self.current_budget != 1:
            x = self.sort_and_drop(x)
        return super().forward(x)


class TorchRankViT(TorchViT):
    """RankViT built on the TorchViT fixture (reference rankvit.py:156-288)."""

    def __init__(self, *args, rankvit_layers=(), **kw):
        super().__init__(*args, **kw)
        self.rankvit_layers = list(rankvit_layers)
        hd = self.layers[0].ln_1.weight.shape[0]
        for i in rankvit_layers:
            old = self.layers[i]
            blk = TorchRankViTBlock(
                old.self_attention.num_heads, hd, old.mlp.fc1.weight.shape[0]
            )
            blk.load_state_dict(old.state_dict())
            self.layers[i] = blk

    def set_budget(self, budget):
        for i in self.rankvit_layers:
            self.layers[i].current_budget = budget


class TorchSigmoidResidualBlock(nn.Module):
    """forward_skip_attention_mlp with sigmoid gate + constant budget token
    (reference residualvit.py:197-260), eval mode, 1 class token."""

    def __init__(self, num_heads, hidden_dim, mlp_dim, temp=1.0, bias=0.0):
        super().__init__()
        self.ln_1 = nn.LayerNorm(hidden_dim, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(hidden_dim, num_heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(hidden_dim, eps=1e-6)
        self.mlp = TorchMLP(hidden_dim, mlp_dim)
        self.gate_proj = nn.Linear(hidden_dim, 1)
        self.temp, self.bias = temp, bias

    def forward(self, tokens):
        special, img, budget_token = tokens[:, :1], tokens[:, 1:-1], tokens[:, -1:]
        current_budget = budget_token.mean()
        mask = torch.sigmoid(self.gate_proj(img) / self.temp + self.bias)
        mask = F.relu(mask - (1 - current_budget))
        masked_input = torch.cat([special, mask * img, budget_token], dim=1)
        ones = torch.ones(mask.size(0), 1, 1)
        fwd_mask = torch.cat([ones, mask, ones], dim=1)
        x = fwd_mask * self.ln_1(masked_input)
        x, _ = self.self_attention(x, x, x)
        x = fwd_mask * x
        x = x + masked_input
        y = fwd_mask * self.ln_2(x)
        y = self.mlp(y)
        return x + y, mask


class TorchAViTBlock(nn.Module):
    """forward_act (reference adavit.py:53-80), CPU, no dropout."""

    def __init__(self, num_heads, hidden_dim, mlp_dim, gate_scale=10.0, gate_center=30.0):
        super().__init__()
        self.ln_1 = nn.LayerNorm(hidden_dim)
        self.self_attention = nn.MultiheadAttention(hidden_dim, num_heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(hidden_dim)
        self.mlp = TorchMLP(hidden_dim, mlp_dim)
        self.gate_scale, self.gate_center = gate_scale, gate_center

    def forward_act(self, x, mask):
        bs, token, dim = x.shape
        a = (1 - mask).view(bs, token, 1)
        y = self.ln_1(x * a) * a
        att, _ = self.self_attention(y, y, y)
        x = x + att
        z = self.ln_2(x * a) * a
        x = x + self.mlp(z)
        h = torch.sigmoid(x[:, :, 0] * self.gate_scale - self.gate_center)
        return x, h


class TorchAViTEncoder(nn.Module):
    """ACT loop (reference adavit.py:140-219), CPU, batch-slice bug fixed
    to mean(h[:,1:]) to match the documented divergence."""

    def __init__(self, num_layers, num_heads, hidden_dim, mlp_dim, seq_length,
                 eps=0.01, gate_scale=10.0, gate_center=30.0):
        super().__init__()
        self.layers = nn.ModuleList([
            TorchAViTBlock(num_heads, hidden_dim, mlp_dim, gate_scale, gate_center)
            for _ in range(num_layers)
        ])
        self.ln = nn.LayerNorm(hidden_dim)
        self.eps = eps
        self.seq_length = seq_length

    def forward(self, x):
        bs = x.size(0)
        n = self.seq_length
        c_token = torch.zeros(bs, n)
        R_token = torch.ones(bs, n)
        mask_token = torch.ones(bs, n)
        self.rho_token = torch.zeros(bs, n)
        self.counter_token = torch.ones(bs, n) * 0 + 1.0
        output = None
        out = x
        self.halting_score_layer = []
        for i, layer in enumerate(self.layers):
            out = out * mask_token.view(bs, n, 1)
            block_output, h_token = layer.forward_act(out, 1.0 - mask_token)
            self.halting_score_layer.append(torch.mean(h_token[:, 1:]))
            out = block_output.clone()
            block_output = block_output * mask_token.view(bs, n, 1)
            if i == len(self.layers) - 1:
                h_token = torch.ones(bs, n)
            c_token = c_token + h_token
            self.rho_token = self.rho_token + mask_token
            reached = (c_token > 1 - self.eps).float() * mask_token
            delta1 = block_output * R_token.view(bs, n, 1) * reached.view(bs, n, 1)
            self.rho_token = self.rho_token + R_token * reached
            not_reached = (c_token < 1 - self.eps).float()
            R_token = R_token - not_reached * h_token
            delta2 = block_output * h_token.view(bs, n, 1) * not_reached.view(bs, n, 1)
            self.counter_token = self.counter_token + not_reached
            mask_token = (c_token < 1 - self.eps).float()
            output = delta1 + delta2 if output is None else output + delta1 + delta2
        return self.ln(output)


class TorchResidualViT(nn.Module):
    """Full residual ViT: TorchViT front/back end around
    TorchSigmoidResidualBlock layers with a CONSTANT-fill budget token
    (reference residualvit.py:400-470, add_budget_token=<float> mode,
    'attention+mlp' skip, sigmoid gates, eval)."""

    def __init__(self, image_size, patch_size, num_layers, num_heads,
                 hidden_dim, mlp_dim, num_classes):
        super().__init__()
        self.patch_size = patch_size
        self.hidden_dim = hidden_dim
        self.conv_proj = nn.Conv2d(3, hidden_dim, kernel_size=patch_size,
                                   stride=patch_size)
        seq = (image_size // patch_size) ** 2 + 1
        self.class_tokens = nn.Parameter(torch.zeros(1, 1, hidden_dim))
        self.pos_embedding = nn.Parameter(torch.randn(1, seq, hidden_dim) * 0.02)
        self.layers = nn.ModuleList(
            [TorchSigmoidResidualBlock(num_heads, hidden_dim, mlp_dim)
             for _ in range(num_layers)]
        )
        self.ln = nn.LayerNorm(hidden_dim)
        self.head = nn.Linear(hidden_dim, num_classes)
        fan_in = 3 * patch_size * patch_size
        nn.init.trunc_normal_(self.conv_proj.weight, std=math.sqrt(1 / fan_in))
        nn.init.zeros_(self.conv_proj.bias)

    def forward(self, x, budget: float):
        n = x.shape[0]
        x = self.conv_proj(x).reshape(n, self.hidden_dim, -1).permute(0, 2, 1)
        x = torch.cat([self.class_tokens.expand(n, -1, -1), x], dim=1)
        x = x + self.pos_embedding
        btok = torch.full((n, 1, self.hidden_dim), float(budget))
        x = torch.cat([x, btok], dim=1)
        for blk in self.layers:
            x, _ = blk(x)
        x = self.ln(x)
        return self.head(x[:, :1].sum(dim=1))
