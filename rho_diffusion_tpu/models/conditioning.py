"""Physics-parameter conditioning modules.

``MultiEmbeddings`` is the reference's conditioning workhorse
(/root/reference/rho_diffusion/models/conditioning.py:31-139): one embedding
table per parameter-space dimension; a batch of raw parameter rows is mapped
to per-dimension categorical indices by value-equality lookup against the
parameter space, and the per-dimension embedding vectors are SUMMED.

The torch value lookup (``torch.where(y[:, i] == values)``) becomes a
vectorized ``argmax`` over an equality matrix against a static value table —
jit-compatible, no data-dependent shapes.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from rho_diffusion_tpu.registry import registry


def classifier_grad_fn(
    classifier_apply: Callable,
    y: jnp.ndarray,
    scale: float = 1.0,
) -> Callable:
    """Build the ``cond_grad_fn`` for classifier guidance.

    Returns ``grad_fn(x, t) = scale * grad_x log p(y | x, t)`` — the
    quantity condition_mean/condition_score consume (reference
    gaussian_diffusion.py:473-510; the reference never shipped a working
    classifier hook, conditioning.py:142-155).

    ``classifier_apply(x, t) -> logits [B, num_classes]``; ``y``: integer
    class targets [B].
    """

    def grad_fn(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        def log_prob(x_in):
            logits = classifier_apply(x_in, t)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.sum(jnp.take_along_axis(logp, y[:, None], axis=-1))

        return scale * jax.grad(log_prob)(x)

    return grad_fn


@registry.register_layer("MultiEmbeddings")
class MultiEmbeddings(nn.Module):
    """Sum of per-parameter embeddings over a discrete parameter space.

    Attributes:
        parameter_space: mapping of parameter name -> list of admissible
            values (ordered). May be a plain dict or a
            ``DiscreteParameterSpace``.
        embedding_dim: length of each embedding vector (reference default 512).
    """

    parameter_space: Any
    embedding_dim: int = 512
    param_dtype: Any = jnp.float32

    def _space_items(self) -> list[tuple[str, tuple]]:
        space = self.parameter_space
        if hasattr(space, "parameters"):  # DiscreteParameterSpace
            space = space.parameters
        if not isinstance(space, Mapping):
            raise TypeError(
                "parameter_space must be a mapping or DiscreteParameterSpace",
            )
        return [(k, tuple(v)) for k, v in space.items()]

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        items = self._space_items()
        emb = None
        for i, (key, values) in enumerate(items):
            yi = y if y.ndim == 1 else y[:, i]
            table = jnp.asarray(values, dtype=jnp.float32)
            # index of each raw value in the admissible-value table
            # (equality semantics identical to the reference's torch.where;
            # unmatched values resolve to index 0 rather than erroring).
            categorical = jnp.argmax(
                yi.astype(jnp.float32)[:, None] == table[None, :], axis=-1,
            )
            layer = nn.Embed(
                num_embeddings=len(values),
                features=self.embedding_dim,
                param_dtype=self.param_dtype,
                name=f"embedding_{key}",
            )
            e = layer(categorical)
            emb = e if emb is None else emb + e
        return emb


@registry.register_layer("FourierConditioning")
class FourierConditioning(nn.Module):
    """Continuous Fourier-feature conditioning over raw parameter rows.

    Drop-in replacement for :class:`MultiEmbeddings` (same constructor
    kwargs, same config seam: ``model.kwargs.cond_fn =
    "FourierConditioning"``) that treats each physics parameter as a
    CONTINUOUS coordinate instead of a categorical index:

    * each column of the raw parameter row is normalised to [0, 1] with
      the static min/max of its admissible-value list;
    * encoded as Fourier features ``[x, sin(2 pi k x), cos(2 pi k x)]``
      for k = 1..n_frequencies (Tancik et al., arXiv:2006.10739);
    * mapped to ``embedding_dim`` by a 2-layer SiLU MLP.

    Why it exists: MultiEmbeddings (the reference's only conditioner,
    /root/reference/rho_diffusion/models/conditioning.py:31-139) learns one
    independent embedding row per grid value, so a condition value that
    never appears in training keeps its random-init row — the model
    structurally CANNOT interpolate to unseen merger times / rotor
    constants / camera poses. The Fourier map is smooth in the parameter,
    so nearby conditions share features and held-out values inherit the
    neighbouring training signal (measured: benchmarks/demo_generalization
    .py, RESULTS round 5). Values outside the space's [min, max] range
    extrapolate linearly in feature space rather than erroring.

    jit-safe: the normalisation constants are static Python floats baked
    at trace time; no data-dependent shapes or control flow.
    """

    parameter_space: Any
    embedding_dim: int = 512
    n_frequencies: int = 6
    param_dtype: Any = jnp.float32

    def _space_items(self) -> list[tuple[str, tuple]]:
        space = self.parameter_space
        if hasattr(space, "parameters"):  # DiscreteParameterSpace
            space = space.parameters
        if not isinstance(space, Mapping):
            raise TypeError(
                "parameter_space must be a mapping or DiscreteParameterSpace",
            )
        return [(k, tuple(v)) for k, v in space.items()]

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        items = self._space_items()
        feats = []
        for i, (key, values) in enumerate(items):
            yi = (y if y.ndim == 1 else y[:, i]).astype(jnp.float32)
            lo = float(min(values))
            hi = float(max(values))
            x01 = (yi - lo) / max(hi - lo, 1e-12)
            k = jnp.arange(1, self.n_frequencies + 1, dtype=jnp.float32)
            ang = 2.0 * jnp.pi * x01[:, None] * k[None, :]
            feats.append(
                jnp.concatenate(
                    [x01[:, None], jnp.sin(ang), jnp.cos(ang)], axis=-1,
                ),
            )
        h = jnp.concatenate(feats, axis=-1)
        h = nn.Dense(
            self.embedding_dim, param_dtype=self.param_dtype, name="mlp_in",
        )(h)
        h = nn.silu(h)
        return nn.Dense(
            self.embedding_dim, param_dtype=self.param_dtype, name="mlp_out",
        )(h)


@registry.register_layer("ClassifierGuidance")
class ClassifierGuidance(nn.Module):
    """Classifier-guidance conditioning hook.

    The reference ships only a placeholder with ``classifier=None``
    (conditioning.py:142-155). The functional guidance math
    (condition_mean/condition_score) lives in the Gaussian diffusion
    pipeline; this module exists for registry parity and carries an optional
    classifier apply function used by those hooks.
    """

    classifier: Any = None
    guidance_scale: float = 1.0

    def grad_fn(self, y: jnp.ndarray) -> Any:
        """The ``cond_grad_fn`` to pass into reverse_process for targets
        ``y`` (see classifier_grad_fn; driven end-to-end in
        tests/pipeline/test_gaussian_pipeline.py)."""
        assert self.classifier is not None, "attach a classifier apply fn"
        return classifier_grad_fn(self.classifier, y, self.guidance_scale)

    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError(
            "ClassifierGuidance is applied at sampling time via "
            "GaussianDiffusion.condition_mean/condition_score (build the "
            "hook with .grad_fn(y)), not as an embedding cond_fn.",
        )
