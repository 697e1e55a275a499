"""Gaussian diffusion as a pytree of precomputed coefficient tables plus pure
functions: q/p distributions, training losses, DDPM/DDIM samplers as
``lax.scan`` loops that run fully on device.

Math semantics mirror /root/reference/improved_diffusion/gaussian_diffusion.py
(hojonathanho-lineage DDPM) and respace.py (SpacedDiffusion), including the
reference's quirks that affect trained-model behavior:

* negative timesteps index coefficient tables from the end (torch semantics of
  ``arr[t-1]`` with t==0), reproduced with an explicit wrap — the
  ``x_t_minus_1`` conditioning path relies on it (gaussian_diffusion.py:814).
* ``FIXED_LARGE`` variance uses ``append(posterior_variance[1], betas[1:])``.
* respaced processes remap model-facing timesteps through ``timestep_map``
  and rescale by ``1000/original_num_steps`` when ``rescale_timesteps``.

Everything is channels-last on device; the channel axis for learned-variance
splitting is the trailing axis (the reference splits dim=1, which is only
correct for images — trailing-axis splitting is correct for both).
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import schedules
from .losses import discretized_gaussian_log_likelihood, mean_flat, normal_kl


class ModelMeanType(str, enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType(str, enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(str, enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


def compute_coefficients(betas: np.ndarray) -> dict:
    """Precompute all diffusion coefficient tables in float64 (host-side).

    Mirrors reference gaussian_diffusion.py:137-172.
    """
    betas = np.array(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    out = dict(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=alphas_cumprod,
        alphas_cumprod_prev=alphas_cumprod_prev,
        alphas_cumprod_next=alphas_cumprod_next,
        sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
        log_one_minus_alphas_cumprod=np.log(1.0 - alphas_cumprod),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod - 1),
        posterior_variance=posterior_variance,
        posterior_log_variance_clipped=np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        ),
        posterior_mean_coef1=betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod),
        posterior_mean_coef2=(1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod),
        log_betas=np.log(betas),
        # FIXED_LARGE variance table (gaussian_diffusion.py:300-308)
        fixed_large_variance=np.append(posterior_variance[1], betas[1:]),
        fixed_large_log_variance=np.log(np.append(posterior_variance[1], betas[1:])),
    )
    return out


_ARRAY_FIELDS = tuple(compute_coefficients(np.array([0.5, 0.5])).keys())


class GaussianDiffusion(struct.PyTreeNode):
    """Diffusion process: coefficient tables (pytree leaves, f32 on device)
    plus static configuration. Passable through jit boundaries."""

    # coefficient tables
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    # respacing: model-facing timestep for each retained step (None if dense)
    timestep_map: Optional[jnp.ndarray] = None
    # static config
    num_timesteps: int = struct.field(pytree_node=False, default=1000)
    original_num_steps: int = struct.field(pytree_node=False, default=1000)
    model_mean_type: ModelMeanType = struct.field(
        pytree_node=False, default=ModelMeanType.EPSILON
    )
    model_var_type: ModelVarType = struct.field(
        pytree_node=False, default=ModelVarType.FIXED_LARGE
    )
    loss_type: LossType = struct.field(pytree_node=False, default=LossType.MSE)
    rescale_timesteps: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #
    @classmethod
    def from_betas(
        cls,
        betas: np.ndarray,
        *,
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.FIXED_LARGE,
        loss_type=LossType.MSE,
        rescale_timesteps=False,
        use_timesteps=None,
        dtype=jnp.float32,
    ) -> "GaussianDiffusion":
        betas = np.array(betas, dtype=np.float64)
        original_num_steps = len(betas)
        timestep_map = None
        if use_timesteps is not None:
            # Rebuild betas over the retained subset (reference respace.py:61-82)
            use_timesteps = set(use_timesteps)
            alphas_cumprod = np.cumprod(1.0 - betas)
            last_alpha_cumprod = 1.0
            new_betas, tmap = [], []
            for i, ac in enumerate(alphas_cumprod):
                if i in use_timesteps:
                    new_betas.append(1 - ac / last_alpha_cumprod)
                    last_alpha_cumprod = ac
                    tmap.append(i)
            betas = np.array(new_betas, dtype=np.float64)
            timestep_map = jnp.asarray(np.array(tmap, dtype=np.int32))
        coeffs = compute_coefficients(betas)
        leaves = {k: jnp.asarray(v, dtype=dtype) for k, v in coeffs.items()}
        return cls(
            **leaves,
            timestep_map=timestep_map,
            num_timesteps=len(betas),
            original_num_steps=original_num_steps,
            model_mean_type=model_mean_type,
            model_var_type=model_var_type,
            loss_type=loss_type,
            rescale_timesteps=rescale_timesteps,
        )

    # ------------------------------------------------------------------ #
    # helpers
    # ------------------------------------------------------------------ #
    def _extract(self, arr, t, ndim):
        """arr[t] broadcast to an ndim-dimensional tensor with leading batch.

        Negative t wraps (torch indexing semantics; see module docstring).
        """
        t = jnp.asarray(t)
        t = jnp.where(t < 0, t + self.num_timesteps, t)
        res = arr[t].astype(jnp.float32)
        return res.reshape(res.shape + (1,) * (ndim - res.ndim))

    def scale_timesteps(self, t):
        """Map sampler-facing t to model-facing t (respacing remap + rescale).

        Mirrors respace._WrappedModel (respace.py:103-119) and
        GaussianDiffusion._scale_timesteps (gaussian_diffusion.py:398-401).
        """
        if self.timestep_map is not None:
            t = self.timestep_map[t]
            if self.rescale_timesteps:
                return t.astype(jnp.float32) * (1000.0 / self.original_num_steps)
            return t
        if self.rescale_timesteps:
            return t.astype(jnp.float32) * (1000.0 / self.num_timesteps)
        return t

    # ------------------------------------------------------------------ #
    # q distributions
    # ------------------------------------------------------------------ #
    def q_mean_variance(self, x_start, t):
        nd = x_start.ndim
        mean = self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
        variance = self._extract(1.0 - self.alphas_cumprod, t, nd)
        log_variance = self._extract(self.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        nd = x_start.ndim
        return (
            self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + self._extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        nd = x_t.ndim
        posterior_mean = (
            self._extract(self.posterior_mean_coef1, t, nd) * x_start
            + self._extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        posterior_variance = self._extract(self.posterior_variance, t, nd)
        posterior_log_variance = self._extract(
            self.posterior_log_variance_clipped, t, nd
        )
        return posterior_mean, posterior_variance, posterior_log_variance

    # ------------------------------------------------------------------ #
    # p distributions
    # ------------------------------------------------------------------ #
    def _predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        nd = x_t.ndim
        return (
            self._extract(1.0 / self.posterior_mean_coef1, t, nd) * xprev
            - self._extract(
                self.posterior_mean_coef2 / self.posterior_mean_coef1, t, nd
            )
            * x_t
        )

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        nd = x_t.ndim
        return (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
        ) / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    def split_model_output(self, model_output, x):
        """Split a learned-variance model output into (mean_part, var_part)
        along the trailing channel axis."""
        C = x.shape[-1]
        assert model_output.shape[-1] == 2 * C, (model_output.shape, x.shape)
        return model_output[..., :C], model_output[..., C:]

    def model_variance_terms(self, model_output, x, t):
        """Compute (model_output_mean_part, model_variance, model_log_variance).

        Mirrors gaussian_diffusion.py:280-317.
        """
        nd = x.ndim
        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = self.split_model_output(model_output, x)
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = self._extract(self.posterior_log_variance_clipped, t, nd)
                max_log = self._extract(self.log_betas, t, nd)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            var_table, logvar_table = {
                ModelVarType.FIXED_LARGE: (
                    self.fixed_large_variance,
                    self.fixed_large_log_variance,
                ),
                ModelVarType.FIXED_SMALL: (
                    self.posterior_variance,
                    self.posterior_log_variance_clipped,
                ),
            }[self.model_var_type]
            model_variance = self._extract(var_table, t, nd)
            model_log_variance = self._extract(logvar_table, t, nd)
        return model_output, model_variance, model_log_variance

    def p_mean_variance(
        self,
        model_fn: Callable[..., Any],
        x,
        t,
        *,
        clip_denoised=True,
        denoised_fn=None,
    ):
        """Compute p(x_{t-1}|x_t) mean/variance and the x_0 prediction.

        ``model_fn(x, t)`` receives *sampler-facing* t; it is responsible for
        calling ``scale_timesteps`` (the model wrappers in models/ do this).
        Mirrors gaussian_diffusion.py:229-372 (sans gradient method, which is
        handled in p_sample_with_gradient_guidance).
        """
        model_output = model_fn(x, t)
        model_output, model_variance, model_log_variance = self.model_variance_terms(
            model_output, x, t
        )

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            return x0

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x_t=x, t=t, xprev=model_output)
            )
            model_mean = model_output
        elif self.model_mean_type in (ModelMeanType.START_X, ModelMeanType.EPSILON):
            if self.model_mean_type == ModelMeanType.START_X:
                pred_xstart = process_xstart(model_output)
            else:
                pred_xstart = process_xstart(
                    self._predict_xstart_from_eps(x_t=x, t=t, eps=model_output)
                )
            model_mean, _, _ = self.q_posterior_mean_variance(
                x_start=pred_xstart, x_t=x, t=t
            )
        else:
            raise NotImplementedError(self.model_mean_type)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # ------------------------------------------------------------------ #
    # sampling steps
    # ------------------------------------------------------------------ #
    @staticmethod
    def _nonzero_mask(t, ndim):
        return (t != 0).astype(jnp.float32).reshape(t.shape + (1,) * (ndim - t.ndim))

    def p_sample(
        self,
        model_fn,
        x,
        t,
        rng,
        *,
        clip_denoised=True,
        denoised_fn=None,
    ):
        """One ancestral sampling step (gaussian_diffusion.py:403-448)."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
        )
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        nonzero_mask = self._nonzero_mask(t, x.ndim)
        sample = out["mean"] + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_with_gradient_guidance(
        self,
        model_fn_no_cond,
        x,
        t,
        rng,
        *,
        obs_mask,
        x_t_minus_1,
        clip_denoised=True,
        weighting_factor=10.0,
    ):
        """Reconstruction-guided sampling step (``use_gradient_method``,
        gaussian_diffusion.py:264-271 and :350-364): the model is run without
        observation conditioning (caller passes a model_fn built with
        obs_mask=0 / latent_mask=obs+latent) and the mean is shifted by the
        gradient of the observed-frame mismatch through the model.
        """
        noise_rng, samp_rng = jax.random.split(rng)
        noise = jax.random.normal(noise_rng, x.shape, dtype=x.dtype)
        nonzero_mask = self._nonzero_mask(t, x.ndim)

        def mismatch(x_in):
            out = self.p_mean_variance(
                model_fn_no_cond, x_in, t, clip_denoised=clip_denoised
            )
            sample_t_minus_1 = (
                out["mean"] + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
            )
            diff = (sample_t_minus_1 - x_t_minus_1) * obs_mask
            return jnp.sum(diff**2)

        g = jax.grad(mismatch)(x)
        out = self.p_mean_variance(model_fn_no_cond, x, t, clip_denoised=clip_denoised)
        vdm_alpha_t = self._extract(self.alphas, t, x.ndim)
        mean = out["mean"] - weighting_factor * vdm_alpha_t * g / 2
        sample = mean + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_sample(
        self,
        model_fn,
        x,
        t,
        rng,
        *,
        clip_denoised=True,
        denoised_fn=None,
        eta=0.0,
    ):
        """One DDIM step (gaussian_diffusion.py:597-634)."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
        )
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        nd = x.ndim
        alpha_bar = self._extract(self.alphas_cumprod, t, nd)
        alpha_bar_prev = self._extract(self.alphas_cumprod_prev, t, nd)
        if isinstance(eta, (int, float)) and eta == 0.0:
            # deterministic DDIM: sigma == 0 exactly, so skip the per-step
            # normal draw entirely. XLA cannot DCE `x * 0` (NaN semantics),
            # and the counter-based PRNG over the full video tensor is pure
            # VPU time inside the reverse scan — measurable at DDIM-250.
            mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
                jnp.maximum(1 - alpha_bar_prev, 0.0)
            ) * eps
            return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
            jnp.maximum(1 - alpha_bar_prev - sigma**2, 0.0)
        ) * eps
        nonzero_mask = self._nonzero_mask(t, nd)
        sample = mean_pred + nonzero_mask * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(self, model_fn, x, t, *, clip_denoised=True):
        """Deterministic DDIM reverse-ODE step (gaussian_diffusion.py:636-668)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised=clip_denoised)
        nd = x.ndim
        eps = (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x
            - out["pred_xstart"]
        ) / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd)
        alpha_bar_next = self._extract(self.alphas_cumprod_next, t, nd)
        mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_next) + jnp.sqrt(
            1 - alpha_bar_next
        ) * eps
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    # ------------------------------------------------------------------ #
    # sampling loops: lax.scan over timesteps, zero host round trips
    # ------------------------------------------------------------------ #
    def p_sample_loop(
        self,
        model_fn,
        shape,
        rng,
        *,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        init=None,
    ):
        """Full ancestral sampling loop as one ``lax.scan``.

        ``model_fn(x, t, step_rng)`` — the extra rng lets video model wrappers
        regenerate per-step conditioning noise (x_t_minus_1 / x_random /
        hybrid), matching p_sample_loop_progressive (gaussian_diffusion.py:563-595).
        ``init`` overrides the starting tensor (reference starts windowed video
        sampling from x0 rather than noise; video_sample.py:150).
        """
        if init is not None:
            img = init
        elif noise is not None:
            img = noise
        else:
            rng, nrng = jax.random.split(rng)
            img = jax.random.normal(nrng, shape, dtype=jnp.float32)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        def body(carry, i):
            img, rng = carry
            rng, mrng, srng = jax.random.split(rng, 3)
            t = jnp.full((shape[0],), i, dtype=jnp.int32)
            out = self.p_sample(
                lambda x, tt: model_fn(x, tt, mrng),
                img,
                t,
                srng,
                clip_denoised=clip_denoised,
                denoised_fn=denoised_fn,
            )
            return (out["sample"], rng), None

        (img, _), _ = jax.lax.scan(body, (img, rng), ts)
        return img

    def ddim_sample_loop(
        self,
        model_fn,
        shape,
        rng,
        *,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        eta=0.0,
        init=None,
    ):
        """Full DDIM sampling loop as one ``lax.scan``."""
        if init is not None:
            img = init
        elif noise is not None:
            img = noise
        else:
            rng, nrng = jax.random.split(rng)
            img = jax.random.normal(nrng, shape, dtype=jnp.float32)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        def body(carry, i):
            img, rng = carry
            rng, mrng, srng = jax.random.split(rng, 3)
            t = jnp.full((shape[0],), i, dtype=jnp.int32)
            out = self.ddim_sample(
                lambda x, tt: model_fn(x, tt, mrng),
                img,
                t,
                srng,
                clip_denoised=clip_denoised,
                denoised_fn=denoised_fn,
                eta=eta,
            )
            return (out["sample"], rng), None

        (img, _), _ = jax.lax.scan(body, (img, rng), ts)
        return img

    # ------------------------------------------------------------------ #
    # likelihood
    # ------------------------------------------------------------------ #
    def _vb_terms_bpd(
        self,
        model_fn,
        x_start,
        x_t,
        t,
        *,
        clip_denoised=True,
        latent_mask=None,
    ):
        """One VLB term in bits (gaussian_diffusion.py:750-788)."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(
            x_start=x_start, x_t=x_t, t=t
        )
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised=clip_denoised)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl, mask=latent_mask) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll, mask=latent_mask) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def make_conditioning_variants(self, x_start, t, noise, rng, observed_frames):
        """Per-step conditioning noisy variants of x0 used by the CondMarg
        model's 'observed_frames' modes (gaussian_diffusion.py:814-828).

        If ``noise`` is given it is reused for all variants (training path,
        gaussian_diffusion.py:814); if None, fresh noise is drawn (sampling
        path, gaussian_diffusion.py:565-582).
        """
        rng, nrng = jax.random.split(rng)
        if noise is None:
            noise = jax.random.normal(nrng, x_start.shape, dtype=x_start.dtype)
        cond = {}
        cond["x_t_minus_1"] = self.q_sample(x_start, t - 1, noise=noise)
        u = jax.random.uniform(rng, t.shape)
        cond["random_t"] = jnp.floor(t * u).astype(jnp.int32)
        cond["x_random"] = self.q_sample(x_start, cond["random_t"], noise=noise)
        if observed_frames is not None and "hybrid" in observed_frames:
            threshold = int(observed_frames.split("_")[-1])
            thr = jnp.full(t.shape, threshold, dtype=jnp.int32)
            cond["hybrid"] = self.q_sample(x_start, thr, noise=noise)
        else:
            cond["hybrid"] = cond["x_t_minus_1"]
        return cond

    def training_losses(
        self,
        model_fn,
        x_start,
        t,
        rng,
        *,
        latent_mask=None,
        eval_mask=None,
        noise=None,
        observed_frames="x_t_minus_1",
    ):
        """Training losses for one timestep batch (gaussian_diffusion.py:790-907).

        ``model_fn(x_t, t, cond)`` where cond carries the conditioning noisy
        variants; image models ignore cond.
        """
        nrng, crng = jax.random.split(rng)
        if noise is None:
            noise = jax.random.normal(nrng, x_start.shape, dtype=x_start.dtype)
        cond = self.make_conditioning_variants(x_start, t, noise, crng, observed_frames)
        x_t = self.q_sample(x_start, t, noise=noise)

        terms = {}
        if self.loss_type.is_vb():
            terms["loss"] = self._vb_terms_bpd(
                lambda x, tt: model_fn(x, tt, cond=cond),
                x_start=x_start,
                x_t=x_t,
                t=t,
                clip_denoised=False,
                latent_mask=latent_mask,
            )["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
        elif self.loss_type in (LossType.MSE, LossType.RESCALED_MSE):
            model_output = model_fn(x_t, t, cond=cond)
            if self.model_var_type in (
                ModelVarType.LEARNED,
                ModelVarType.LEARNED_RANGE,
            ):
                mean_part, var_part = self.split_model_output(model_output, x_t)
                frozen_out = jnp.concatenate(
                    [jax.lax.stop_gradient(mean_part), var_part], axis=-1
                )
                terms["vb"] = self._vb_terms_bpd(
                    lambda *args: frozen_out,
                    x_start=x_start,
                    x_t=x_t,
                    t=t,
                    clip_denoised=False,
                )["output"]
                if self.loss_type == LossType.RESCALED_MSE:
                    terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)
                model_output = mean_part

            target = {
                ModelMeanType.PREVIOUS_X: lambda: self.q_posterior_mean_variance(
                    x_start=x_start, x_t=x_t, t=t
                )[0],
                ModelMeanType.START_X: lambda: x_start,
                ModelMeanType.EPSILON: lambda: noise,
            }[self.model_mean_type]()
            assert model_output.shape == target.shape == x_start.shape
            terms["mse"] = mean_flat((target - model_output) ** 2, mask=latent_mask)
            terms["eval-mse"] = mean_flat(
                (target - model_output) ** 2, mask=eval_mask
            )
            terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        else:
            raise NotImplementedError(self.loss_type)
        return terms

    def _prior_bpd(self, x_start, latent_mask=None):
        batch_size = x_start.shape[0]
        t = jnp.full((batch_size,), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior, mask=latent_mask) / np.log(2.0)

    def calc_bpd_loop_subsampled(
        self,
        model_fn,
        x_start,
        rng,
        *,
        clip_denoised=True,
        latent_mask=None,
        t_seq=None,
    ):
        """Masked VLB over a (possibly per-item 2-D) sequence of timesteps
        (gaussian_diffusion.py:928-1002). Runs as one lax.scan over the K
        timesteps. ``t_seq``: None (all, descending), 1-D (K,), or 2-D (N, K).
        """
        B = x_start.shape[0]
        if t_seq is None:
            t_seq = np.arange(self.num_timesteps)[::-1]
        t_seq = np.asarray(t_seq)
        if t_seq.ndim == 2:
            t_mat = jnp.asarray(t_seq.T.astype(np.int32))  # (K, B)
        else:
            t_mat = jnp.asarray(
                np.broadcast_to(t_seq.astype(np.int32)[:, None], (len(t_seq), B))
            )

        def body(rng, t_batch):
            rng, nrng = jax.random.split(rng)
            noise = jax.random.normal(nrng, x_start.shape, dtype=x_start.dtype)
            x_t = self.q_sample(x_start=x_start, t=t_batch, noise=noise)
            out = self._vb_terms_bpd(
                model_fn,
                x_start=x_start,
                x_t=x_t,
                t=t_batch,
                clip_denoised=clip_denoised,
                latent_mask=latent_mask,
            )
            xstart_mse = mean_flat(
                (out["pred_xstart"] - x_start) ** 2, mask=latent_mask
            )
            eps = self._predict_eps_from_xstart(x_t, t_batch, out["pred_xstart"])
            mse = mean_flat((eps - noise) ** 2, mask=latent_mask)
            return rng, (out["output"], xstart_mse, mse)

        _, (vb, xstart_mse, mse) = jax.lax.scan(body, rng, t_mat)
        vb = vb.T  # (N, K)
        xstart_mse = xstart_mse.T
        mse = mse.T
        prior_bpd = self._prior_bpd(x_start, latent_mask=latent_mask)
        total_bpd = vb.sum(axis=1) + prior_bpd
        return {
            "total_bpd": total_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }

    def calc_bpd_loop(self, model_fn, x_start, rng, **kw):
        return self.calc_bpd_loop_subsampled(
            model_fn,
            x_start,
            rng,
            t_seq=np.arange(self.num_timesteps)[::-1],
            **kw,
        )


def create_diffusion(
    *,
    steps=1000,
    learn_sigma=False,
    sigma_small=False,
    noise_schedule="linear",
    use_kl=False,
    predict_xstart=False,
    rescale_timesteps=False,
    rescale_learned_sigmas=False,
    timestep_respacing="",
) -> GaussianDiffusion:
    """Factory matching reference script_util.create_gaussian_diffusion
    (script_util.py:405-436)."""
    betas = schedules.get_named_beta_schedule(noise_schedule, steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if not timestep_respacing:
        timestep_respacing = [steps]
    return GaussianDiffusion.from_betas(
        betas,
        use_timesteps=schedules.space_timesteps(steps, timestep_respacing),
        model_mean_type=(
            ModelMeanType.EPSILON if not predict_xstart else ModelMeanType.START_X
        ),
        model_var_type=(
            (ModelVarType.FIXED_LARGE if not sigma_small else ModelVarType.FIXED_SMALL)
            if not learn_sigma
            else ModelVarType.LEARNED_RANGE
        ),
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
    )
