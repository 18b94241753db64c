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
           "graft_base_params",
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


def graft_base_params(lora_params, plain_params):
    """Copy an adapter-free param tree into the frozen-base slots of a
    LoRA-wrapped tree (LoRADense nests the kernel under 'base'); fresh
    lora_a/lora_b leaves are kept. This is how a pretrained base is
    carried into each LoRA experiment -- the tiny-model analogue of
    loading the pretrained LLaVA before attaching adapters."""
    import flax.traverse_util as tu
    flat_l = dict(tu.flatten_dict(lora_params))
    flat_p = dict(tu.flatten_dict(plain_params))
    out = {}
    for k, v in flat_l.items():
        if k[-1] in ("lora_a", "lora_b"):
            out[k] = v
            continue
        # the plain tree may or may not nest kernels under 'base'
        # (lm.py wraps projections in LoRADense even at rank 0)
        pk = k if k in flat_p else tuple(p for p in k if p != "base")
        if pk not in flat_p:
            raise KeyError(f"pretrained tree missing {pk}")
        out[k] = flat_p[pk]
    return tu.unflatten_dict(out)


def merge_lora_params(params, adapter):
    """Overlay saved adapter leaves onto a param tree."""
    import flax.traverse_util as tu
    flat = dict(tu.flatten_dict(params))
    for k, v in tu.flatten_dict(adapter).items():
        flat[k] = v
    return tu.unflatten_dict(flat)
