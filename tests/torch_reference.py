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
