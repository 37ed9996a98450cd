"""DDPM pipeline — Ho et al. (2020) epsilon-prediction, exact reference
semantics (/root/reference/rho_diffusion/diffusion/ddpm.py:46-371).

Functional core:

* ``q_sample``: x_t = sqrt(abar_t) x_0 + sqrt(1 - abar_t) eps
  (reference forward_process, ddpm.py:104-130);
* ``ddpm_reverse_step``: x_{t-1} = 1/sqrt(alpha_t) (x_t - beta_t /
  sqrt(1-abar_t) eps_hat) + 0.8 sqrt(beta_t) z, then clamp to [-1, 1].
  The 0.8 noise factor and the clamp are the reference's intended sampling
  behaviour (ddpm.py:211-218) and are preserved verbatim;
* the reverse process is a single ``lax.scan`` over t = T-1 .. 0 running
  entirely on device (the reference loops in Python with tqdm,
  ddpm.py:195-227), with the same gating: noise only for t > 1, state update
  only for t > 0, and an optional intermediate-frame buffer written every
  T//10 steps (t_checkpoints, ddpm.py:158-169/221-227).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rho_diffusion_tpu.diffusion.base import (
    AbstractDiffusionPipeline,
    extract,
    normalize_batch,
)
from rho_diffusion_tpu.diffusion.schedule import NoiseSchedule


def q_sample(
    schedule: NoiseSchedule,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward (noising) process q(x_t | x_0)."""
    ab = extract(schedule.alpha_bar_t, t, x0.ndim)
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise


def ddpm_reverse_step(
    schedule: NoiseSchedule,
    x_t: jnp.ndarray,
    eps_hat: jnp.ndarray,
    t: jnp.ndarray,
    z: jnp.ndarray,
    noise_factor: float = 0.8,
    clip: bool = True,
) -> jnp.ndarray:
    """One reverse step (reference ddpm.py:211-218), vectorised over batch."""
    alpha = extract(schedule.alpha_t, t, x_t.ndim)
    beta = extract(schedule.beta_t, t, x_t.ndim)
    ab = extract(schedule.alpha_bar_t, t, x_t.ndim)
    mean = (x_t - beta / jnp.sqrt(1.0 - ab) * eps_hat) / jnp.sqrt(alpha)
    out = mean + noise_factor * jnp.sqrt(beta) * z
    if clip:
        out = jnp.clip(out, -1.0, 1.0)
    return out


class DDPM(AbstractDiffusionPipeline):
    """Epsilon-prediction DDPM with the reference's training and sampling
    semantics (ddpm.py:46-371)."""

    def __init__(
        self,
        backbone,
        backbone_kwargs: dict[str, Any],
        schedule: NoiseSchedule,
        loss_func="MSELoss",
        timesteps: Optional[int] = None,
        cond_fn=None,
        cond_fn_kwargs: Optional[dict] = None,
        optimizer=None,
        opt_kwargs: Optional[dict] = None,
        t_checkpoints=None,
        sampling_batch_size: int = 10,
        sample_every_n_epochs: int = 5,
        sample_parameter_space: Optional[dict] = None,
        save_checkpoint_every_n_epochs: int = 10,
        noise_factor: float = 0.8,
        clip_denoised: bool = True,
        cond_dropout: float = 0.0,
        loss_weighting: Optional[str] = None,
        min_snr_gamma: float = 5.0,
        **base_kwargs,
    ) -> None:
        super().__init__(
            backbone=backbone,
            backbone_kwargs=backbone_kwargs,
            schedule=schedule,
            loss_func=loss_func,
            timesteps=timesteps,
            cond_fn=cond_fn,
            cond_fn_kwargs=cond_fn_kwargs,
            optimizer=optimizer,
            opt_kwargs=opt_kwargs,
            **base_kwargs,
        )
        # epsilon-only pipeline: ddpm_reverse_step divides by sqrt(alpha_t),
        # which is 0 at the terminal step of a zero-terminal-SNR schedule —
        # NaN samples with no error (mirror of the GaussianDiffusionPipeline
        # epsilon gate)
        if float(np.asarray(self.schedule.alpha_bar_t)[-1]) == 0.0:
            raise ValueError(
                "zero-terminal-SNR schedule (alpha_bar_T == 0) with the "
                "epsilon-only DDPM pipeline: the reverse step divides by "
                "sqrt(alpha_T) = 0. Use GaussianDiffusionPipeline with "
                "model_mean_type='v_prediction'.",
            )
        self.t_checkpoints = t_checkpoints
        self.sampling_batch_size = sampling_batch_size
        self.sample_every_n_epochs = sample_every_n_epochs
        self.sample_parameter_space = sample_parameter_space
        self.save_weights_every_n_epochs = save_checkpoint_every_n_epochs
        self.noise_factor = noise_factor
        self.clip_denoised = clip_denoised
        self.cond_dropout = self.validate_cond_dropout(cond_dropout)
        # min-SNR weighting re-weights a per-sample MSE; any other loss_func
        # has no SNR-space interpretation, so reject the combination at
        # construction instead of training silently-wrong
        from rho_diffusion_tpu.diffusion.gaussian import (
            ModelMeanType, validate_loss_weighting,
        )
        self.loss_weighting = validate_loss_weighting(
            loss_weighting, ModelMeanType.EPSILON,
        )
        self.min_snr_gamma = float(min_snr_gamma)
        # Only STRING names can be checked; a callable loss_func is the
        # caller's assertion that it is (a variant of) MSE — rejecting every
        # callable would make min_snr unusable with a user-supplied MSE.
        if self.loss_weighting and isinstance(loss_func, str) and \
                loss_func not in ("MSELoss", "mse", "mse_loss"):
            raise ValueError(
                f"loss_weighting='min_snr' requires an MSE loss_func, got {loss_func!r}",
            )

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------
    def forward_process(self, rng, data, t=None):
        """Noise a clean batch; returns (x_t, noise, t)
        (reference ddpm.py:104-130)."""
        t_rng, n_rng = jax.random.split(rng)
        if t is None:
            t = self.random_timesteps(t_rng, data.shape[0])
        noise = jax.random.normal(n_rng, data.shape, data.dtype)
        return q_sample(self.schedule, data, t, noise), noise, t

    def loss_and_metrics(self, params, batch, rng):
        """MSE between predicted and true noise at random timesteps
        (reference training_step, ddpm.py:231-288). The reference's NaN
        guard sys.exit becomes a debug-checkable metric."""
        batch = normalize_batch(batch)
        data, labels = batch["data"], batch["labels"]
        cond_mask = None
        if self.cond_dropout > 0.0:
            # classifier-free guidance training: per-row conditioning dropout
            # (the extra split only happens when CFG is on, so existing runs'
            # RNG streams are untouched)
            rng, m_rng = jax.random.split(rng)
            cond_mask = self.cond_dropout_mask(m_rng, data.shape[0], labels)
        x_t, noise, t = self.forward_process(rng, data)
        eps_hat = self.apply(params, x_t, t, labels, train=True, cond_mask=cond_mask)
        if self.loss_weighting == "min_snr":
            from rho_diffusion_tpu.diffusion.gaussian import (
                ModelMeanType, min_snr_weight,
            )
            from rho_diffusion_tpu.ops.convolution import mean_flat
            w = min_snr_weight(
                self.schedule.alpha_bar_t, t,
                ModelMeanType.EPSILON, self.min_snr_gamma,
            )
            per_sample = mean_flat((eps_hat - noise.astype(eps_hat.dtype)) ** 2)
            loss = jnp.mean(w * per_sample)
        else:
            loss = self.loss_func(eps_hat, noise.astype(eps_hat.dtype))
        metrics = self.training_metrics(data, x_t, loss)
        return loss, metrics

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------
    def reverse_process(
        self,
        params,
        rng: jax.Array,
        shape: tuple[int, ...],
        conditions: Optional[jnp.ndarray] = None,
        t_checkpoints=None,
        x_T: Optional[jnp.ndarray] = None,
        guidance_scale: Optional[float] = None,
    ) -> dict:
        """Full ancestral sampling as one on-device ``lax.scan``
        (reference ddpm.py:132-229). Returns {'denoised', 'buffer'}.

        ``guidance_scale`` != 1 applies classifier-free guidance (needs a
        model trained with ``cond_dropout`` > 0).

        ``rng`` may be a batched [B] typed key array (see sampling_rng):
        each row's step noise is then ``fold_in(row_key, t)``, independent
        of batch composition — the serving determinism contract."""
        from rho_diffusion_tpu.diffusion.sampling_rng import (
            is_per_sample_keys,
            keys_at_step,
            normal_like,
        )

        T = len(self.schedule)
        batch_size = shape[0]
        per_row = is_per_sample_keys(rng)
        if per_row:
            scan_rng = rng
            x = (
                normal_like(keys_at_step(rng, T), shape)
                if x_T is None
                else x_T
            )
        else:
            noise_rng, scan_rng = jax.random.split(rng)
            x = jax.random.normal(noise_rng, shape) if x_T is None else x_T

        num_ckpt = len(t_checkpoints) if t_checkpoints is not None else 0
        steps_per_ckpt = max(T // 10, 1)
        buff0 = (
            jnp.zeros((batch_size, num_ckpt, *shape[1:]), x.dtype)
            if num_ckpt
            else None
        )

        schedule = self.schedule
        noise_factor = self.noise_factor
        clip = self.clip_denoised
        if (
            guidance_scale is not None
            and float(guidance_scale) != 1.0
            and conditions is not None
        ):
            model_fn = self.guided_model_fn(params, conditions, guidance_scale)
        else:
            def model_fn(x, tt):
                return self.apply(params, x, tt, conditions).astype(x.dtype)

        def body(carry, t):
            x, key, ckpt_idx, buff = carry
            if per_row:
                z_key = keys_at_step(key, t)
            else:
                key, z_key = jax.random.split(key)
            z = normal_like(z_key, x.shape, x.dtype)
            z = jnp.where(t > 1, z, jnp.zeros_like(z))
            tt = jnp.full((batch_size,), t, jnp.int32)
            eps_hat = model_fn(x, tt)
            x_next = ddpm_reverse_step(
                schedule, x, eps_hat.astype(x.dtype), tt, z,
                noise_factor=noise_factor, clip=clip,
            )
            x = jnp.where(t > 0, x_next, x)
            if buff is not None:
                write = jnp.logical_and(t % steps_per_ckpt == 0, ckpt_idx < num_ckpt)
                idx = jnp.clip(ckpt_idx, 0, num_ckpt - 1)
                updated = jax.lax.dynamic_update_index_in_dim(
                    buff, x[:, None], idx, axis=1,
                )
                buff = jnp.where(write, updated, buff)
                ckpt_idx = ckpt_idx + write.astype(jnp.int32)
            return (x, key, ckpt_idx, buff), None

        steps = jnp.arange(T - 1, -1, -1)
        (x, _, _, buff), _ = jax.lax.scan(
            body, (x, scan_rng, jnp.zeros((), jnp.int32), buff0), steps,
        )
        return {"denoised": x, "buffer": buff}

    def p_sample(
        self,
        params,
        rng: jax.Array,
        batch_size: Optional[int] = None,
        conditions=None,
        parameter_space: Optional[dict] = None,
        random: bool = True,
        as_hash_embeddings: bool = False,
        guidance_scale: Optional[float] = None,
    ) -> dict:
        """Draw samples, building the shape from backbone kwargs and the
        conditions from a parameter space (reference p_sample/generate,
        ddpm.py:319-360)."""
        batch_size = batch_size or self.sampling_batch_size
        shape = self.sample_shape(batch_size)
        if conditions is None and parameter_space is not None:
            conditions = self.conditions_from_parameter_space(
                parameter_space,
                batch_size,
                random=random,
                as_hash_embeddings=as_hash_embeddings,
                embedding_dim=self.condition_embedding_dim(),
            )
        else:
            # split so the condition draw ('auto') and the sampler noise
            # never consume the same key (classic JAX key-reuse)
            rng, cond_rng = jax.random.split(rng)
            conditions = self.coerce_conditions(conditions, batch_size, cond_rng)
        # cache the jitted sampler per (shape, conditioning, quant mode) so
        # repeated epoch-end generation doesn't re-trace the T-step scan —
        # the quant mode is read at trace time, so a toggled set_conv_quant
        # must not silently reuse a trace from the old mode
        from rho_diffusion_tpu.ops.quant import get_conv_quant

        key = ("ddpm", shape, conditions is not None,
               len(self.t_checkpoints) if self.t_checkpoints is not None else 0,
               guidance_scale, get_conv_quant())
        if key not in self._sampler_cache:
            self._sampler_cache[key] = jax.jit(
                lambda p, r, c: self.reverse_process(
                    p, r, shape, c, t_checkpoints=self.t_checkpoints,
                    guidance_scale=guidance_scale,
                ),
            )
        return self._sampler_cache[key](params, rng, conditions)

    def generate(
        self,
        params,
        rng: Optional[jax.Array] = None,
        batch_size: Optional[int] = None,
        parameter_space: Optional[dict] = None,
        conditions=None,
        random: bool = True,
        as_hash_embeddings: bool = False,
        guidance_scale: Optional[float] = None,
    ) -> jnp.ndarray:
        """Sample a batch of fields (reference generate, ddpm.py:342-360)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        space = parameter_space or self.sample_parameter_space
        out = self.p_sample(
            params,
            rng,
            batch_size=batch_size,
            conditions=conditions,
            parameter_space=space,
            random=random,
            as_hash_embeddings=as_hash_embeddings,
            guidance_scale=guidance_scale,
        )
        return out["denoised"]
