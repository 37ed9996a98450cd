"""Progressive distillation (Salimans & Ho, arXiv:2202.00512).

Halve the number of sampling steps repeatedly: a student with N/2 DDIM
steps is trained so that ONE student step reproduces TWO deterministic
DDIM steps of the N-step teacher, then becomes the teacher for the next
halving. After distilling e.g. 64 -> 4, four model evaluations sample at
(near) teacher quality — the serving-latency endgame past DPM-Solver++.

New capability: the reference framework has no distillation surface at
all; its only fast-sampling story is DDIM striding
(/root/reference/rho_diffusion/diffusion/gaussian_diffusion.py:654-702).

TPU-first mechanics: a distillation stage is ONE jitted update — the two
teacher DDIM steps, the closed-form target inversion, the student
forward/backward and the optax update all fuse into a single XLA program
(teacher math under ``stop_gradient``), so a stage trains at ordinary
train-step cost (~3 model forwards + 1 backward per update). Grid nesting
is exact: the student grid is every other teacher point
(``respace_subset``), so the target inversion

    x0_target = (x_t'' - (sigma''/sigma) x_t) / (alpha'' - (sigma''/sigma) alpha)

is algebraically exact — with an oracle teacher (one that predicts the
true noise) the target equals the true x0 bit-for-bit (see
tests/pipeline/test_distill.py).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rho_diffusion_tpu.diffusion.gaussian import (
    GaussianCoefficients,
    ddim_sample_step,
    p_mean_variance,
    q_sample,
    respace_subset,
)
from rho_diffusion_tpu.diffusion.base import extract, normalize_batch


def distill_grid(num_timesteps: int, n: int) -> np.ndarray:
    """The SELF-NESTED n-point timestep grid t_i = round((i+1)·T/n) - 1.

    Unlike guided-diffusion's leading stride (space_timesteps, which
    anchors at t=0 and is NOT closed under halving), the trailing grid's
    every-other-point subset IS the trailing grid of n/2 — so each
    halving stage's student grid is exactly the next stage's teacher
    grid, and every stage tops out at t = T-1 (full noise). The bottom
    step still denoises to x0 through ``alphas_cumprod_prev[0] == 1``.
    Also reachable as ``respace(coeffs, n, spacing='trailing')`` /
    ``reverse_process(num_steps=n, spacing='trailing')``."""
    from rho_diffusion_tpu.diffusion.gaussian import space_timesteps_trailing

    if n > num_timesteps:
        raise ValueError(
            f"cannot stride {num_timesteps} timesteps to {n} distinct points",
        )
    return space_timesteps_trailing(num_timesteps, n)  # n == T: identity grid


def distilled_coefficients(
    coeffs: GaussianCoefficients, n: int,
) -> GaussianCoefficients:
    """The coefficient table a distilled n-step student samples with —
    ``respace_subset`` over :func:`distill_grid` (NOT the uniform-t grid
    ``reverse_process(num_steps=n)`` would build)."""
    return respace_subset(coeffs, distill_grid(coeffs.num_timesteps, n))


def nested_grids(coeffs: GaussianCoefficients, n_teacher: int):
    """(teacher, student) coefficient tables with EXACTLY nested grids:
    teacher = ``distill_grid(T, n)``, student = every other teacher point
    (``[1::2]`` == ``distill_grid(T, n/2)``). Student index j sits at
    teacher index 2j+1, and one student step j spans teacher steps 2j+1
    then 2j."""
    if n_teacher % 2 or n_teacher < 2:
        raise ValueError(f"n_teacher must be even and >= 2, got {n_teacher}")
    if n_teacher > coeffs.num_timesteps:
        raise ValueError(
            f"n_teacher={n_teacher} exceeds the table ({coeffs.num_timesteps})",
        )
    use_t = distill_grid(coeffs.num_timesteps, n_teacher)
    c_teacher = respace_subset(coeffs, use_t)
    c_student = respace_subset(coeffs, use_t[1::2])
    return c_teacher, c_student


def distill_targets(
    c_teacher: GaussianCoefficients,
    c_student: GaussianCoefficients,
    teacher_fn: Callable,
    x_t: jnp.ndarray,
    j: jnp.ndarray,
    mean_type,
    var_type,
    clip_denoised: bool = False,
    thresholding_percentile: float = 0.9,
):
    """x0-space target for student step ``j`` (per-row): run the teacher
    two deterministic DDIM steps (teacher indices 2j+1, 2j) from ``x_t``
    and invert the single student step that would land exactly there.
    Pure function of the teacher — wrapped in ``stop_gradient``."""
    kw = dict(
        clip_denoised=clip_denoised,
        thresholding_percentile=thresholding_percentile,
        eta=0.0,
    )
    dummy = jax.random.PRNGKey(0)  # eta=0: the noise branch is multiplied by 0
    x1, _ = ddim_sample_step(
        c_teacher, teacher_fn, x_t, 2 * j + 1, dummy, mean_type, var_type, **kw,
    )
    x2, _ = ddim_sample_step(
        c_teacher, teacher_fn, x1, 2 * j, dummy, mean_type, var_type, **kw,
    )
    alpha = extract(c_student.sqrt_alphas_cumprod, j, x_t.ndim)
    sigma = extract(c_student.sqrt_one_minus_alphas_cumprod, j, x_t.ndim)
    acp_pp = extract(c_student.alphas_cumprod_prev, j, x_t.ndim)
    alpha_pp = jnp.sqrt(acp_pp)
    sigma_pp = jnp.sqrt(1.0 - acp_pp)
    ratio = sigma_pp / sigma
    # alpha'' > alpha and sigma'' < sigma on any monotone schedule, so the
    # denominator is strictly positive; at j == 0 (acp_prev == 1) it is
    # exactly 1 and the target is the teacher's final x0 itself
    x0_target = (x2 - ratio * x_t) / (alpha_pp - ratio * alpha)
    return jax.lax.stop_gradient(x0_target)


def truncated_snr_weight(
    c_student: GaussianCoefficients, j: jnp.ndarray, ndim: int,
) -> jnp.ndarray:
    """max(SNR, 1) — the paper's truncated-SNR weighting for the x0-space
    loss (arXiv:2202.00512 §4: plain SNR weighting vanishes at the
    high-noise end where few-step students do all their work)."""
    acp = extract(c_student.alphas_cumprod, j, ndim)
    return jnp.maximum(acp / (1.0 - acp), 1.0)


class ProgressiveDistiller:
    """Drives halving stages against a :class:`GaussianDiffusionPipeline`.

    The student shares the pipeline's backbone, mean/variance types and
    conditioning plumbing; each stage's update is one jitted function.

    Usage::

        d = ProgressiveDistiller(pipe, opt_kwargs={"lr": 1e-4})
        params, info = d.distill(
            teacher_params, batches, from_steps=64, to_steps=4,
            updates_per_stage=400, rng=jax.random.PRNGKey(0),
        )
        samples = d.sample(params, rng, shape, n_steps=4)  # 4 model evals

    (``d.sample`` uses the trailing distillation grid the student was
    trained on; ``reverse_process(num_steps=4)`` would stride uniform-t.)
    """

    def __init__(
        self,
        pipeline,
        optimizer: str = "AdamW",
        opt_kwargs: Optional[dict] = None,
        loss_weight: str = "truncated_snr",
        clip_teacher: bool = False,
        lr_schedule: str = "warmup_cosine",
    ):
        if loss_weight not in ("truncated_snr", "one"):
            raise ValueError(
                f"loss_weight must be 'truncated_snr' or 'one', got {loss_weight!r}",
            )
        if lr_schedule not in ("warmup_cosine", "constant"):
            raise ValueError(
                f"lr_schedule must be 'warmup_cosine' or 'constant', "
                f"got {lr_schedule!r}",
            )
        self.pipeline = pipeline
        self.loss_weight = loss_weight
        self.clip_teacher = clip_teacher
        self.lr_schedule = lr_schedule
        self._optimizer = optimizer
        self._opt_kwargs = dict(opt_kwargs or {"lr": 1e-4})
        self._tx_cache: dict = {}
        self._step_cache: dict = {}
        self._sampler_cache: dict = {}

    def _get_tx(self, updates: Optional[int]):
        """Per-stage optimizer. The default warmup+cosine schedule matters:
        each stage fine-tunes an already-converged net with FRESH Adam
        state, and a cold second moment makes the first constant-lr steps
        effectively huge — measured on-chip as loss divergence within a
        stage. Linear warmup (10% of the stage, <=100 steps) then cosine
        decay to lr/10 is the paper's recipe shape (arXiv:2202.00512 §5)."""
        key = updates if self.lr_schedule == "warmup_cosine" else "constant"
        if key in self._tx_cache:
            return self._tx_cache[key]
        from rho_diffusion_tpu.training.optimizers import build_optimizer

        kw = dict(self._opt_kwargs)
        lr = kw.pop("learning_rate", kw.pop("lr", 1e-4))
        if self.lr_schedule == "warmup_cosine" and updates:
            import optax

            warm = max(1, min(100, updates // 10))
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr, warmup_steps=warm,
                decay_steps=max(updates, warm + 1), end_value=0.1 * lr,
            )
        tx = build_optimizer(self._optimizer, kw, learning_rate=lr)
        self._tx_cache[key] = tx
        return tx

    # -- one stage ------------------------------------------------------
    def make_stage_step(self, n_teacher: int, updates: Optional[int] = None) -> Callable:
        """Jitted ``(opt_params, opt_state, teacher_params, batch, rng) ->
        (opt_params, opt_state, loss)`` for one halving stage."""
        tx = self._get_tx(updates)
        cache_key = (
            n_teacher,
            updates if self.lr_schedule == "warmup_cosine" else "constant",
        )
        if cache_key in self._step_cache:
            return self._step_cache[cache_key]
        pipe = self.pipeline
        c_teacher, c_student = nested_grids(pipe.coeffs, n_teacher)
        n_student = n_teacher // 2

        def loss_fn(params, teacher_params, data, labels, rng):
            j_rng, n_rng = jax.random.split(rng)
            B = data.shape[0]
            j = jax.random.randint(j_rng, (B,), 0, n_student)
            noise = jax.random.normal(n_rng, data.shape, data.dtype)
            x_t = q_sample(c_student, data, j, noise)
            teacher_fn = pipe._model_fn(
                jax.lax.stop_gradient(teacher_params), labels,
            )
            x0_target = distill_targets(
                c_teacher, c_student, teacher_fn, x_t, j,
                pipe.model_mean_type, pipe.model_var_type,
                clip_denoised=self.clip_teacher,
                thresholding_percentile=pipe.thresholding_percentile,
            )
            out = p_mean_variance(
                c_student,
                pipe._model_fn(params, labels, train=True),
                x_t, j,
                pipe.model_mean_type, pipe.model_var_type,
                clip_denoised=False,
            )
            w = (
                truncated_snr_weight(c_student, j, data.ndim)
                if self.loss_weight == "truncated_snr"
                else 1.0
            )
            return jnp.mean(w * (out["pred_xstart"] - x0_target) ** 2)

        @jax.jit
        def stage_step(params, opt_state, teacher_params, batch, rng):
            batch = normalize_batch(batch)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, teacher_params, batch["data"], batch["labels"], rng,
            )
            upd, opt_state = tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, upd)
            return params, opt_state, loss

        self._step_cache[cache_key] = stage_step
        return stage_step

    def distill_stage(
        self,
        teacher_params,
        batches,
        n_teacher: int,
        updates: int,
        rng,
        init_params=None,
        log_fn: Optional[Callable] = None,
    ):
        """One halving: returns (student_params, losses). ``batches`` is a
        callable ``(update_idx) -> batch`` or an iterable cycled over."""
        if updates < 1:
            raise ValueError(f"updates must be >= 1, got {updates}")
        step = self.make_stage_step(n_teacher, updates)
        params = init_params if init_params is not None else teacher_params
        opt_state = self._get_tx(updates).init(params)
        get = batches if callable(batches) else _cycler(batches)
        losses = []
        for i in range(updates):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, teacher_params, get(i), sub,
            )
            losses.append(loss)
        losses = [float(l) for l in losses]
        if log_fn is not None:
            log_fn({
                "stage": f"{n_teacher}->{n_teacher // 2}",
                "loss_first": losses[0],
                "loss_last": losses[-1],
            })
        return params, losses

    def distill(
        self,
        teacher_params,
        batches,
        from_steps: int,
        to_steps: int,
        updates_per_stage: int,
        rng,
        log_fn: Optional[Callable] = None,
    ):
        """Run halvings ``from_steps -> ... -> to_steps``. Returns the
        final student params and per-stage loss curves. Sample the result
        with :meth:`sample` — it uses the trailing distillation grid the
        student was trained on; ``reverse_process(num_steps=to_steps)``
        would stride a DIFFERENT (leading uniform-t) grid and evaluate the
        student at timesteps it was never distilled for."""
        ratio = from_steps // max(to_steps, 1)
        if (
            from_steps < to_steps
            or from_steps != to_steps * ratio
            or ratio & (ratio - 1)  # power of two, or the halvings miss it
        ):
            raise ValueError(
                f"from_steps={from_steps} must be a 2^k multiple of "
                f"to_steps={to_steps}",
            )
        n = from_steps
        params = teacher_params
        info = {}
        while n > to_steps:
            rng, sub = jax.random.split(rng)
            student, losses = self.distill_stage(
                params, batches, n, updates_per_stage, sub, log_fn=log_fn,
            )
            info[f"{n}->{n // 2}"] = losses
            params = student
            n //= 2
        return params, info

    # -- sampling on the distillation grid -------------------------------
    def sample(
        self,
        params,
        rng,
        shape,
        n_steps: int,
        conditions=None,
        guidance_scale=None,
    ):
        """Deterministic DDIM sampling over the trailing n-step grid the
        student was distilled on (jit-cached per (shape, n_steps))."""
        from rho_diffusion_tpu.diffusion.gaussian import sample_loop

        pipe = self.pipeline
        key = (shape, n_steps, conditions is not None, guidance_scale)
        if key not in self._sampler_cache:
            c = distilled_coefficients(pipe.coeffs, n_steps)
            self._sampler_cache[key] = jax.jit(
                lambda p, r, cond: sample_loop(
                    c,
                    pipe._model_fn(p, cond, guidance_scale=guidance_scale),
                    shape,
                    r,
                    pipe.model_mean_type,
                    pipe.model_var_type,
                    sampler="ddim",
                    eta=0.0,
                    clip_denoised=pipe.clip_denoised,
                    thresholding_percentile=pipe.thresholding_percentile,
                ),
            )
        return self._sampler_cache[key](params, rng, conditions)


def _cycler(batches):
    batches = list(batches)
    if not batches:
        raise ValueError("batches is empty: pass a non-empty iterable "
                         "or a callable (update_idx) -> batch")

    def get(i):
        return batches[i % len(batches)]

    return get
