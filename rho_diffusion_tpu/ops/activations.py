"""Activation functions, registered by the same names the reference exposes.

The reference prepopulates its registry with torch.nn activations
(/root/reference/rho_diffusion/registry.py:160-203) plus a custom
``SymmetricLog`` (/root/reference/rho_diffusion/activations.py:34-61).
Here each registered name is a zero-arg factory returning a jnp-callable, so
config-driven construction ``registry.get("activations", name)()`` matches
the reference's ``Class()`` instantiation pattern.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rho_diffusion_tpu.registry import registry


def symmetric_log(x: jnp.ndarray) -> jnp.ndarray:
    """SymmetricLog activation (arXiv:2111.15631):
    tanh(x) + tanh(x) * log(x * tanh(x) + 1)  — smooth, unbounded, symmetric.
    (reference activations.py:34-61)."""
    tx = jnp.tanh(x)
    return tx + tx * jnp.log1p(x * tx)


_ACTIVATIONS = {
    "ReLU": jax.nn.relu,
    "ReLU6": jax.nn.relu6,
    "SiLU": jax.nn.silu,
    "GELU": jax.nn.gelu,
    "Tanh": jnp.tanh,
    "Sigmoid": jax.nn.sigmoid,
    "LeakyReLU": jax.nn.leaky_relu,
    "ELU": jax.nn.elu,
    "CELU": jax.nn.celu,
    "SELU": jax.nn.selu,
    "Softplus": jax.nn.softplus,
    "Mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "Hardswish": jax.nn.hard_swish,
    "Hardtanh": jax.nn.hard_tanh,
    "Identity": lambda x: x,
    "SymmetricLog": symmetric_log,
}


def _make_factory(fn):
    def factory():
        return fn

    return factory


for _name, _fn in _ACTIVATIONS.items():
    _factory = _make_factory(_fn)
    _factory.__name__ = _name
    registry.add("activations", _name, _factory)


def resolve_activation(activation) -> callable:
    """Accept a registry name, a factory, or a raw callable and return the
    jnp-callable activation function."""
    if isinstance(activation, str):
        activation = registry.get("activations", activation)
    if activation in _ACTIVATIONS.values():
        return activation
    out = activation() if not _is_array_fn(activation) else activation
    return out


def _is_array_fn(fn) -> bool:
    # Heuristic: factories take zero args; activations take the array.
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return True
    return len(sig.parameters) >= 1
