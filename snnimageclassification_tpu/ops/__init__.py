"""TPU compute ops: surrogate gradients, neuron cells, encoding, filters."""
from .surrogate import (
    SPIKE_FN_REGISTRY,
    SpikeFuncType,
    heaviside_phi,
    heaviside_sigmoid,
    resolve_spike_fn,
)
from .cells import (
    ALIFConfig,
    ALIFState,
    IzhikevichConfig,
    IzhikevichState,
    LayerType,
    LIFConfig,
    LIFState,
    ReadoutConfig,
    ReadoutState,
    alif_init_params,
    alif_init_state,
    alif_step,
    izhikevich_init_params,
    izhikevich_init_state,
    izhikevich_step,
    lif_init_params,
    lif_init_state,
    lif_step,
    masked_recurrent,
    readout_init_params,
    readout_init_state,
    readout_step,
)
from .encoding import (
    ToSpikes,
    encode_spikes,
    firing_periods_to_spikes,
    firing_times_to_spikes,
    pixels_to_firing_periods,
)
from .temporal import batchwise_temporal_filter, temporal_max
