"""LoRA adapters for Flax Dense layers.

Rebuild of the reference's peft usage (vla_trainer.py:33-43: r=8,
alpha=32, dropout=0.1 on q/k/v/o/gate/up/down projections) as a native
Flax module: y = x W + (alpha / r) * (x A) B with A ~ N(0, 1/r), B = 0,
so the adapter starts as the identity delta.  LoRA parameters live under
'lora_a'/'lora_b' leaf names so optimizers can mask the frozen base.
"""

from __future__ import annotations

import jax
import flax.linen as nn

__all__ = ["LoRADense", "lora_mask", "merge_lora_params",
           "extract_lora_params"]


class LoRADense(nn.Module):
    features: int
    rank: int = 0              # 0 -> plain Dense
    alpha: float = 32.0
    dropout: float = 0.0
    use_bias: bool = False
    kernel_init: nn.initializers.Initializer = \
        nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=self.kernel_init, name="base")(x)
        if self.rank > 0:
            a = self.param("lora_a",
                           nn.initializers.normal(1.0 / self.rank),
                           (x.shape[-1], self.rank))
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.rank, self.features))
            h = x
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            y = y + (self.alpha / self.rank) * ((h @ a) @ b)
        return y


def lora_mask(params) -> object:
    """PyTree of bools: True for LoRA params (trainable), False for
    the frozen base -- feed to optax.masked."""
    def is_lora(path):
        return any(str(getattr(p, "key", "")) in ("lora_a", "lora_b")
                   for p in path)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_lora(path), params)


def extract_lora_params(params):
    """Nested dict containing only LoRA leaves (for adapter save)."""
    import flax.traverse_util as tu
    flat = tu.flatten_dict(params)
    lora = {k: v for k, v in flat.items()
            if k[-1] in ("lora_a", "lora_b")}
    return tu.unflatten_dict(lora)


def merge_lora_params(params, adapter):
    """Overlay saved adapter leaves onto a param tree."""
    import flax.traverse_util as tu
    flat = dict(tu.flatten_dict(params))
    for k, v in tu.flatten_dict(adapter).items():
        flat[k] = v
    return tu.unflatten_dict(flat)
