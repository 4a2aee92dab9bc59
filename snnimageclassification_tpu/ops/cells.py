"""Functional spiking-neuron cells.

Each cell is a *pure function* ``step(cfg, params, state, x_t) -> (out_t,
state')`` over a NamedTuple state pytree -- the idiomatic JAX shape for a
recurrence that compiles to ``lax.scan`` (instead of the reference's
per-time-step Python loop over ``torch.nn.Module``s,
src/modules/spiking_layers.py:156-171).

Dynamics parity (reference ``src/modules/spiking_layers.py``):

* **LIF** (spiking_layers.py:96-171): ``alpha = exp(-dt/tau_m)``;
  multiplicative reset with detached spike:
  ``V' = (alpha*V + I_in + I_rec) * (1 - stop_grad(Z))``;
  ``Z' = spike_fn(V', threshold, gamma)``.
* **ALIF** (spiking_layers.py:174-243): adds adaptation
  ``a' = rho*a + Z`` with ``rho = exp(-dt/tau_a)`` and dynamic threshold
  ``A = threshold + beta*a'``; ``Z' = spike_fn(V', A, gamma)``.
* **Izhikevich** (spiking_layers.py:246-353): quadratic membrane dynamics,
  reset to ``c`` and jump ``d`` on spike, spike against ``v_peak``.
* **Readout** (spiking_layers.py:356-408): non-spiking leaky integrator
  ``V' = kappa*V + x @ W + b``.

Recurrent connections multiply the *previous spike* by an optionally
eye-masked weight matrix ``W_rec * (1 - I)`` (spiking_layers.py:50-51,165).
The mask is applied once per forward pass (see ``masked_recurrent``), not
per scan step, so the scan body sees a plain matmul.

Default constants reproduce the reference's *effective* defaults,
including quirk Q1: the reference's
``isinstance(self.spike_func, HeavisideSigmoidApprox)`` check compares a
*class* against ``isinstance`` and is always False
(spiking_layers.py:127-130, 206-209, 295-298), so the gamma=100.0 branch is
dead code and the effective gammas are LIF=1.0, ALIF=0.3, Izhikevich=1.0.
"""
from __future__ import annotations

import dataclasses
import enum
import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .surrogate import SpikeFuncType, resolve_spike_fn

__all__ = [
    "LayerType",
    "LIFConfig",
    "ALIFConfig",
    "IzhikevichConfig",
    "ReadoutConfig",
    "LIFState",
    "ALIFState",
    "IzhikevichState",
    "ReadoutState",
    "lif_init_state",
    "alif_init_state",
    "izhikevich_init_state",
    "readout_init_state",
    "lif_step",
    "alif_step",
    "izhikevich_step",
    "readout_step",
    "lif_init_params",
    "alif_init_params",
    "izhikevich_init_params",
    "readout_init_params",
    "masked_recurrent",
    "LAYER_TYPE_TO_CONFIG",
]


class LayerType(enum.Enum):
    """Mirror of the reference's LayerType enum (spiking_layers.py:11-14)."""

    LIF = enum.auto()
    ALIF = enum.auto()
    Izhikevich = enum.auto()


# ---------------------------------------------------------------------------
# Configs: static hyperparameters, baked into the jaxpr at trace time.
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class LIFConfig:
    """Static config for a LIF layer.

    Defaults match spiking_layers.py:124-130 (with quirk Q1's effective
    gamma).  ``alpha`` is derived: ``exp(-dt/tau_m)``
    (spiking_layers.py:119).
    """

    input_size: int
    output_size: int
    use_recurrent_connection: bool = True
    use_rec_eye_mask: bool = True
    dt: float = 1e-3
    tau_m: Optional[float] = None  # default: 10*dt
    threshold: float = 1.0
    gamma: float = 1.0
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid

    layer_type = LayerType.LIF

    @property
    def tau_m_eff(self) -> float:
        return 10.0 * self.dt if self.tau_m is None else self.tau_m

    @property
    def alpha(self) -> float:
        return math.exp(-self.dt / self.tau_m_eff)

    @property
    def spike_fn(self) -> Callable:
        return resolve_spike_fn(self.spike_func)


@dataclasses.dataclass(frozen=True)
class ALIFConfig(LIFConfig):
    """Static config for an ALIF layer (spiking_layers.py:201-210).

    ``learn_beta`` places ``beta`` into the parameter pytree.  Two
    reference quirks are replicated deliberately:

    * **init**: the reference's model-level then layer-level weight init
      sweeps run ``normal_(std=threshold)`` over *every* layer parameter
      including the scalar beta (snn.py:149-157 + spiking_layers.py:132-138),
      so a learnable beta starts at ``N(0, threshold^2)`` -- *not* 1.6.
    * **gradient**: beta only feeds the spike function's threshold
      argument, whose cotangent is zero (spike_funcs.py:62), so beta never
      trains.  See ops/surrogate.py.
    """

    tau_m: Optional[float] = None  # default: 20*dt
    tau_a: Optional[float] = None  # default: 200*dt
    beta: float = 1.6
    threshold: float = 0.03
    gamma: float = 0.3
    learn_beta: bool = False

    layer_type = LayerType.ALIF

    @property
    def tau_m_eff(self) -> float:
        return 20.0 * self.dt if self.tau_m is None else self.tau_m

    @property
    def tau_a_eff(self) -> float:
        return 200.0 * self.dt if self.tau_a is None else self.tau_a

    @property
    def rho(self) -> float:
        return math.exp(-self.dt / self.tau_a_eff)


@dataclasses.dataclass(frozen=True)
class IzhikevichConfig(LIFConfig):
    """Static config for an Izhikevich layer (spiking_layers.py:285-298)."""

    C: float = 100.0
    v_rest: float = -60.0
    v_th: float = -40.0
    k: float = 0.7
    a: float = 0.03
    b: float = -2.0
    c: float = -50.0
    d: float = 100.0
    v_peak: float = 35.0
    gamma: float = 1.0
    # threshold unused by the dynamics; weight init uses std=1
    # (spiking_layers.py:300-306).

    layer_type = LayerType.Izhikevich


@dataclasses.dataclass(frozen=True)
class ReadoutConfig:
    """Static config for the readout layer (spiking_layers.py:356-408)."""

    input_size: int
    output_size: int
    dt: float = 1e-3
    tau_out: Optional[float] = None  # default: 10*dt

    use_recurrent_connection = False

    @property
    def tau_out_eff(self) -> float:
        return 10.0 * self.dt if self.tau_out is None else self.tau_out

    @property
    def kappa(self) -> float:
        return math.exp(-self.dt / self.tau_out_eff)


LAYER_TYPE_TO_CONFIG = {
    LayerType.LIF: LIFConfig,
    LayerType.ALIF: ALIFConfig,
    LayerType.Izhikevich: IzhikevichConfig,
}


# ---------------------------------------------------------------------------
# States
# ---------------------------------------------------------------------------
class LIFState(NamedTuple):
    v: jax.Array  # membrane potential (B, out)
    z: jax.Array  # previous spikes   (B, out)


class ALIFState(NamedTuple):
    v: jax.Array  # membrane potential  (B, out)
    a: jax.Array  # adaptation variable (B, out)
    z: jax.Array  # previous spikes     (B, out)


class IzhikevichState(NamedTuple):
    v: jax.Array  # membrane potential (B, out)
    u: jax.Array  # recovery variable  (B, out)
    z: jax.Array  # previous spikes    (B, out)


class ReadoutState(NamedTuple):
    v: jax.Array  # integrator potential (B, out)


def lif_init_state(cfg: LIFConfig, batch_size: int, dtype=jnp.float32) -> LIFState:
    """Zero state, matching create_empty_state (spiking_layers.py:140-154)."""
    shape = (batch_size, cfg.output_size)
    return LIFState(v=jnp.zeros(shape, dtype), z=jnp.zeros(shape, dtype))


def alif_init_state(cfg: ALIFConfig, batch_size: int, dtype=jnp.float32) -> ALIFState:
    shape = (batch_size, cfg.output_size)
    z = jnp.zeros(shape, dtype)
    return ALIFState(v=z, a=z, z=z)


def izhikevich_init_state(
    cfg: IzhikevichConfig, batch_size: int, dtype=jnp.float32
) -> IzhikevichState:
    """V starts at v_rest, not zero (spiking_layers.py:317-322)."""
    shape = (batch_size, cfg.output_size)
    return IzhikevichState(
        v=jnp.full(shape, cfg.v_rest, dtype),
        u=jnp.zeros(shape, dtype),
        z=jnp.zeros(shape, dtype),
    )


def readout_init_state(
    cfg: ReadoutConfig, batch_size: int, dtype=jnp.float32
) -> ReadoutState:
    return ReadoutState(v=jnp.zeros((batch_size, cfg.output_size), dtype))


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------
def _normal(key, shape, std, dtype):
    return std * jax.random.normal(key, shape, dtype)


def lif_init_params(cfg: LIFConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Weights ~ N(0, threshold^2).

    The reference's layer init draws ``normal_(std=threshold)`` for every
    2-D parameter (spiking_layers.py:132-138); xavier is only used for
    >2-D params, which never exist here.
    """
    k_in, k_rec = jax.random.split(key)
    params = {
        "w_in": _normal(k_in, (cfg.input_size, cfg.output_size), cfg.threshold, dtype)
    }
    if cfg.use_recurrent_connection:
        params["w_rec"] = _normal(
            k_rec, (cfg.output_size, cfg.output_size), cfg.threshold, dtype
        )
    return params


def alif_init_params(cfg: ALIFConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    k_w, k_beta = jax.random.split(key)
    params = lif_init_params(cfg, k_w, dtype)
    if cfg.learn_beta:
        # Quirk: learnable beta is swept by the same normal(std=threshold)
        # init as the weights (snn.py:149-157 -> spiking_layers.py:132-138),
        # so it starts near zero rather than at cfg.beta=1.6.
        params["beta"] = _normal(k_beta, (), cfg.threshold, dtype)
    return params


def izhikevich_init_params(
    cfg: IzhikevichConfig, key: jax.Array, dtype=jnp.float32
) -> dict:
    """Weights ~ N(0, 1) (spiking_layers.py:300-306)."""
    k_in, k_rec = jax.random.split(key)
    params = {"w_in": _normal(k_in, (cfg.input_size, cfg.output_size), 1.0, dtype)}
    if cfg.use_recurrent_connection:
        params["w_rec"] = _normal(
            k_rec, (cfg.output_size, cfg.output_size), 1.0, dtype
        )
    return params


def readout_init_params(cfg: ReadoutConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """W ~ N(0,1), b = 0 (spiking_layers.py:383-385 via RNNLayer:88-93)."""
    return {
        "w_in": _normal(key, (cfg.input_size, cfg.output_size), 1.0, dtype),
        "b": jnp.zeros((cfg.output_size,), dtype),
    }


def masked_recurrent(cfg, params: dict) -> Optional[jax.Array]:
    """Effective recurrent weights ``W_rec * (1 - I)``.

    The eye mask removes self-connections (spiking_layers.py:50-51).  Apply
    once per forward pass; the masked matrix is what enters the scan body.
    """
    if not cfg.use_recurrent_connection:
        return None
    w_rec = params["w_rec"]
    if cfg.use_rec_eye_mask:
        w_rec = w_rec * (1.0 - jnp.eye(cfg.output_size, dtype=w_rec.dtype))
    return w_rec


# ---------------------------------------------------------------------------
# Step functions
# ---------------------------------------------------------------------------
def _currents(x, z, w_in, w_rec_eff, precomputed_input_current: bool):
    """Input + recurrent synaptic currents for one step.

    When ``precomputed_input_current`` is True, ``x`` already *is*
    ``x @ w_in`` -- the model hoists the first layer's input matmul out of
    the scan into one large (T*B, F) @ (F, H) MXU matmul.
    """
    if precomputed_input_current:
        i_in = x
    else:
        i_in = x @ w_in
    if w_rec_eff is not None:
        if w_rec_eff.dtype != i_in.dtype:
            # Reduced-precision matmul operands (e.g. bf16 W_rec from
            # SNNConfig.matmul_dtype) with full-precision accumulation.
            rec = jax.lax.dot_general(
                z.astype(w_rec_eff.dtype), w_rec_eff,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=i_in.dtype,
            )
        else:
            rec = z @ w_rec_eff
        i_in = i_in + rec
    return i_in


def lif_step(
    cfg: LIFConfig,
    params: dict,
    state: LIFState,
    x: jax.Array,
    *,
    w_rec_eff: Optional[jax.Array] = None,
    precomputed_input_current: bool = False,
):
    """One LIF time step (spiking_layers.py:156-171)."""
    cur = _currents(x, state.z, params.get("w_in"), w_rec_eff, precomputed_input_current)
    v = (cfg.alpha * state.v + cur) * (1.0 - jax.lax.stop_gradient(state.z))
    z = cfg.spike_fn(v, cfg.threshold, cfg.gamma)
    return z, LIFState(v=v, z=z)


def alif_step(
    cfg: ALIFConfig,
    params: dict,
    state: ALIFState,
    x: jax.Array,
    *,
    w_rec_eff: Optional[jax.Array] = None,
    precomputed_input_current: bool = False,
):
    """One ALIF time step (spiking_layers.py:229-243)."""
    cur = _currents(x, state.z, params.get("w_in"), w_rec_eff, precomputed_input_current)
    v = (cfg.alpha * state.v + cur) * (1.0 - jax.lax.stop_gradient(state.z))
    a = cfg.rho * state.a + state.z
    beta = params["beta"] if cfg.learn_beta else cfg.beta
    dyn_threshold = cfg.threshold + beta * a
    z = cfg.spike_fn(v, dyn_threshold, cfg.gamma)
    return z, ALIFState(v=v, a=a, z=z)


def izhikevich_step(
    cfg: IzhikevichConfig,
    params: dict,
    state: IzhikevichState,
    x: jax.Array,
    *,
    w_rec_eff: Optional[jax.Array] = None,
    precomputed_input_current: bool = False,
):
    """One Izhikevich time step (spiking_layers.py:337-353)."""
    cur = _currents(x, state.z, params.get("w_in"), w_rec_eff, precomputed_input_current)
    is_reset = jax.lax.stop_gradient(state.z)
    dvdt = cfg.k * (state.v - cfg.v_rest) * (state.v - cfg.v_th) - state.u + cur
    v = (state.v + cfg.dt * dvdt / cfg.C) * (1.0 - is_reset) + cfg.c * is_reset
    dudt = cfg.a * (cfg.b * (state.v - cfg.v_rest) - state.u)
    u = (state.u + cfg.dt * dudt) + cfg.d * is_reset
    z = cfg.spike_fn(v, cfg.v_peak, cfg.gamma)
    return z, IzhikevichState(v=v, u=u, z=z)


def readout_step(
    cfg: ReadoutConfig,
    params: dict,
    state: ReadoutState,
    x: jax.Array,
    *,
    w_rec_eff: Optional[jax.Array] = None,
    precomputed_input_current: bool = False,
):
    """One readout step: leaky integration (spiking_layers.py:402-408)."""
    i_in = x if precomputed_input_current else x @ params["w_in"]
    v = cfg.kappa * state.v + i_in + params["b"]
    return v, ReadoutState(v=v)


STEP_FNS = {
    LIFConfig: lif_step,
    ALIFConfig: alif_step,
    IzhikevichConfig: izhikevich_step,
    ReadoutConfig: readout_step,
}

INIT_STATE_FNS = {
    LIFConfig: lif_init_state,
    ALIFConfig: alif_init_state,
    IzhikevichConfig: izhikevich_init_state,
    ReadoutConfig: readout_init_state,
}

INIT_PARAM_FNS = {
    LIFConfig: lif_init_params,
    ALIFConfig: alif_init_params,
    IzhikevichConfig: izhikevich_init_params,
    ReadoutConfig: readout_init_params,
}
