"""Diffusion samplers (host-side step logic, device-side math).

The model families use three scheduler types (SURVEY §2.4):
  * flow-match Euler (Hunyuan, Flux, Wan2.2 TI2V) — with Flux's
    resolution-dependent timestep shifting,
  * UniPC multistep for flow matching (Wan2.1, flow_shift=5.0,
    reference: scripts/main_wan21t2v.py:236-241),
  * CogVideoX DDIM with dynamic classifier-free guidance
    (reference: scripts/main_cogvideox.py:274-288).

All schedulers are tiny host-side state machines; per-step tensor math is
pure jnp so it fuses into the jitted step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def flow_shift_timesteps(num_steps: int, shift: float = 1.0) -> np.ndarray:
    """sigma_i in (1, 0], shifted: sigma' = s*sigma / (1 + (s-1)*sigma)."""
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps)
    if shift != 1.0:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    return sigmas


def flux_mu_shift(seq_len: int, base_len: int = 256, max_len: int = 4096,
                  base_shift: float = 0.5, max_shift: float = 1.15) -> float:
    """Flux's resolution-dependent exponential shift parameter."""
    m = (max_shift - base_shift) / (max_len - base_len)
    b = base_shift - m * base_len
    return seq_len * m + b


@dataclasses.dataclass
class FlowMatchEulerScheduler:
    """First-order Euler over the rectified-flow ODE.
    x_{t-1} = x_t + (sigma_{t-1} - sigma_t) * v_pred."""
    num_steps: int
    shift: float = 7.0
    use_mu: bool = False
    mu: float = 0.0

    def __post_init__(self):
        if self.use_mu:
            sigmas = np.linspace(1.0, 1.0 / self.num_steps, self.num_steps)
            emu = math.exp(self.mu)
            sigmas = emu / (emu + (1.0 / sigmas - 1.0))
        else:
            sigmas = flow_shift_timesteps(self.num_steps, self.shift)
        self.sigmas = np.append(sigmas, 0.0)

    @property
    def timesteps(self) -> np.ndarray:
        """Model-facing timesteps in [0, 1000)."""
        return self.sigmas[:-1] * 1000.0

    def step(self, model_out, sample, i: int):
        dt = self.sigmas[i + 1] - self.sigmas[i]
        return sample + model_out * dt

    def scale_noise(self, sample, noise, i: int):
        s = self.sigmas[i]
        return (1.0 - s) * sample + s * noise


@dataclasses.dataclass
class UniPCScheduler:
    """UniPC multistep (order 2) for flow matching — the Wan2.1 sampler
    (diffusers UniPCMultistepScheduler with flow_shift, prediction_type
    flow_prediction).  Implements the B(h)=h bh2 variant."""
    num_steps: int
    shift: float = 5.0
    order: int = 2

    def __post_init__(self):
        sigmas = flow_shift_timesteps(self.num_steps, self.shift)
        self.sigmas = np.append(sigmas, 0.0)
        self._model_outputs: list = [None] * self.order
        self._lower_order_nums = 0
        self._last_sample = None
        self._step_index = 0

    @property
    def timesteps(self) -> np.ndarray:
        return self.sigmas[:-1] * 1000.0

    def _sigma_to_alpha_t(self, sigma):
        # flow matching: alpha_t = 1 - sigma, sigma_t = sigma
        return 1.0 - sigma, sigma

    def _convert_model_output(self, model_out, sample, sigma):
        # flow prediction -> x0 prediction: x0 = x_t - sigma * v
        return sample - sigma * model_out

    def step(self, model_out, sample, i: int):
        """UniPC predictor-corrector (data prediction, B(h)=h "bh2",
        order ≤ 2): the corrector refines the PREVIOUS prediction with this
        step's converted x0, then the predictor advances."""
        sigma = self.sigmas[i]
        x0 = self._convert_model_output(model_out, sample, sigma)

        if self._last_sample is not None and self._lower_order_nums >= 1:
            sample = self._unic(x0, self._last_sample, i)

        self._model_outputs = self._model_outputs[1:] + [x0]
        order = min(self.order, self._lower_order_nums + 1,
                    self.num_steps - i)
        self._last_sample = sample
        out = self._unip(sample, i, order)
        self._lower_order_nums = min(self._lower_order_nums + 1, self.order)
        self._step_index = i + 1
        return out

    def _lambda(self, sigma):
        alpha_t, sigma_t = self._sigma_to_alpha_t(sigma)
        return math.log(max(alpha_t, 1e-12)) - math.log(max(sigma_t, 1e-12))

    def _coeffs(self, hh):
        """(h_phi_1, b1, b2) for the bh2 data-prediction branch:
        b_k = phi_{k+1}-style coefficients divided by B(h)=hh."""
        h_phi_1 = math.expm1(hh)
        h_phi_2 = h_phi_1 / hh - 1.0
        h_phi_3 = h_phi_2 / hh - 0.5
        b1 = h_phi_2 / hh            # = h_phi_2 * 1 / B_h
        b2 = h_phi_3 * 2.0 / hh
        return h_phi_1, b1, b2

    def _unip(self, sample, i, order):
        s0, st = self.sigmas[i], self.sigmas[i + 1]
        lam_t, lam_s0 = self._lambda(st), self._lambda(s0)
        a_t, sg_t = self._sigma_to_alpha_t(st)
        _, sg_s0 = self._sigma_to_alpha_t(s0)
        h = lam_t - lam_s0
        hh = -h
        h_phi_1, b1, _ = self._coeffs(hh)
        x0_0 = self._model_outputs[-1]
        x_t = sg_t / sg_s0 * sample - a_t * h_phi_1 * x0_0
        if order >= 2 and self._model_outputs[-2] is not None:
            lam_prev = self._lambda(self.sigmas[i - 1])
            rk = (lam_prev - lam_s0) / h
            d1 = (self._model_outputs[-2] - x0_0) / rk
            # order-2 predictor: rhos_p solves the 1x1 system [1][rho]=[b1]
            x_t = x_t - a_t * hh * b1 * d1
        return x_t

    def _unic(self, x0_new, last_sample, i):
        s0, st = self.sigmas[i - 1], self.sigmas[i]
        lam_t, lam_s0 = self._lambda(st), self._lambda(s0)
        a_t, sg_t = self._sigma_to_alpha_t(st)
        _, sg_s0 = self._sigma_to_alpha_t(s0)
        h = lam_t - lam_s0
        hh = -h
        h_phi_1, b1, b2 = self._coeffs(hh)
        x0_0 = self._model_outputs[-1]
        d1_t = x0_new - x0_0
        x_t_ = sg_t / sg_s0 * last_sample - a_t * h_phi_1 * x0_0
        if self._lower_order_nums >= 2 and self._model_outputs[-2] is not None:
            lam_prev = self._lambda(self.sigmas[i - 2])
            rk = (lam_prev - lam_s0) / h
            d1 = (self._model_outputs[-2] - x0_0) / rk
            # order-2 corrector: [[1,1],[rk,1]] [rho1,rho2] = [b1,b2]
            rho1 = (b1 - b2) / (1.0 - rk)
            rho2 = b1 - rho1
            corr = rho1 * d1 + rho2 * d1_t
        else:
            corr = 0.5 * d1_t      # order-1 corrector
        return x_t_ - a_t * hh * corr


def _rescale_zero_terminal_snr(alphas_cum: np.ndarray) -> np.ndarray:
    """Zero-terminal-SNR beta rescale (Lin et al.; diffusers
    CogVideoXDDIMScheduler.rescale_zero_terminal_snr): shift/scale
    sqrt(alpha_bar) so the last timestep has alpha_bar exactly 0."""
    ab_sqrt = np.sqrt(alphas_cum)
    ab0, abT = ab_sqrt[0], ab_sqrt[-1]
    ab_sqrt = (ab_sqrt - abT) * ab0 / (ab0 - abT)
    return ab_sqrt ** 2


@dataclasses.dataclass
class CogVideoXDDIMScheduler:
    """DDIM (eta=0) over the CogVideoX scaled-linear betas, matching the
    checkpoint's scheduler config the reference pipeline loads
    (THUDM/CogVideoX1.5-5B scheduler_config.json: trailing timestep
    spacing, rescale_betas_zero_snr, set_alpha_to_one, snr_shift_scale 1.0,
    v_prediction; reference driver: main_cogvideox.py:274-288)."""
    num_steps: int
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    snr_shift_scale: float = 1.0    # CogVideoX 1.5 uses 1.0
    rescale_betas_zero_snr: bool = True
    timestep_spacing: str = "trailing"

    def __post_init__(self):
        betas = np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                            self.num_train_timesteps) ** 2
        alphas_cum = np.cumprod(1.0 - betas)
        if self.snr_shift_scale != 1.0:
            alphas_cum = alphas_cum / (
                self.snr_shift_scale + (1 - self.snr_shift_scale) * alphas_cum)
        if self.rescale_betas_zero_snr:
            alphas_cum = _rescale_zero_terminal_snr(alphas_cum)
        self.alphas_cum = alphas_cum
        self.final_alpha_cum = 1.0     # set_alpha_to_one
        if self.timestep_spacing == "trailing":
            ratio = self.num_train_timesteps / self.num_steps
            self._timesteps = np.round(np.arange(
                self.num_train_timesteps, 0, -ratio)).astype(np.int64) - 1
        else:  # leading
            step = self.num_train_timesteps // self.num_steps
            self._timesteps = (np.arange(self.num_steps) * step)[::-1].copy()

    @property
    def timesteps(self) -> np.ndarray:
        return self._timesteps.astype(np.float32)

    def step(self, model_out, sample, i: int):
        t = int(self._timesteps[i])
        prev_t = t - self.num_train_timesteps // self.num_steps
        a_t = self.alphas_cum[t]
        a_prev = (self.alphas_cum[prev_t] if prev_t >= 0
                  else self.final_alpha_cum)
        # v-prediction (CogVideoX): x0 = sqrt(a) x - sqrt(1-a) v
        x0 = (a_t ** 0.5) * sample - ((1 - a_t) ** 0.5) * model_out
        eps = (a_t ** 0.5) * model_out + ((1 - a_t) ** 0.5) * sample
        return (a_prev ** 0.5) * x0 + ((1 - a_prev) ** 0.5) * eps


def dynamic_cfg_scale(base_scale: float, timestep: float,
                      num_steps: int) -> float:
    """CogVideoX dynamic guidance, replicating diffusers'
    pipeline_cogvideox.py use_dynamic_cfg expression verbatim — it is
    keyed on the RAW scheduler timestep (0..999), not the step index:
    1 + g * (1 - cos(pi * ((steps - t)/steps)^5)) / 2."""
    return 1.0 + base_scale * (
        (1.0 - math.cos(math.pi * (
            (num_steps - float(timestep)) / num_steps) ** 5.0)) / 2.0)
