"""Plot the Heaviside spike function and its surrogate gradients.

Parity with the reference's ``spike_funcs.py`` ``__main__`` block
(spike_funcs.py:88-115): evaluates each surrogate's gradient across a
range of membrane potentials around the threshold and renders them with
the step function.

Usage: python scripts/plot_surrogates.py [out.png]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main(out_path: str = "surrogates.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from snnimageclassification_tpu.ops.surrogate import (
        heaviside_phi,
        heaviside_sigmoid,
    )

    threshold, gamma = 1.0, 1.0
    x = jnp.linspace(threshold - 2.0, threshold + 2.0, 1000)
    y = (x >= threshold).astype(jnp.float32)

    grads = {
        "FastSigmoid": jax.vmap(
            jax.grad(lambda v: heaviside_sigmoid(v, threshold, gamma))
        )(x),
        "Bellec": jax.vmap(
            jax.grad(lambda v: heaviside_phi(v, threshold, gamma))
        )(x),
    }

    plt.figure(figsize=(8, 5))
    plt.plot(np.asarray(x), np.asarray(y), label="Heaviside")
    for name, g in grads.items():
        plt.plot(np.asarray(x), np.asarray(g), label=name)
    plt.xlabel("V [mV]")
    plt.legend()
    plt.savefig(out_path, dpi=200)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
