"""End-to-end /verify drive on the real TPU: train a DEEP (2-hidden)
recurrent ALIF classifier through the public Trainer surface -- the
round-5 deep fused-head dispatch (layer-0 fused -> mid-head kernel) is
the default path for this config -- and assert loss drops and accuracy
beats chance.  Also drives a count-regularized fit (mid-head _counts
kernel) and prints explain_dispatch.

Run: PYTHONPATH=/root/repo python scripts/drive_deep_verify.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax
import numpy as np


def main() -> int:
    import snnimageclassification_tpu as st
    from snnimageclassification_tpu import models
    from snnimageclassification_tpu.data.datasets import (
        ArrayDataLoader,
        EncodeConfig,
    )
    from snnimageclassification_tpu.models import snn as msnn
    from snnimageclassification_tpu.train import losses as L
    from snnimageclassification_tpu.train.trainer import Trainer
    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())

    T = 12
    cfg = st.SNNConfig(
        input_size=784, output_size=10, n_hidden_neurons=[128, 128],
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True, int_time_steps=T,
    )
    enc = EncodeConfig(n_steps=T, use_periods=True)
    for e in msnn.explain_dispatch(cfg, enc):
        print("dispatch:", e)
    # Round-5 final: 2-hidden configs route through the fused2
    # whole-network pair (ops/pallas_fused2.py), not the composed
    # layer-0-fused + mid-head pair.
    assert msnn._twolayer_head_fusible(cfg, enc), \
        "twolayer gate should be ON here"

    rng = np.random.default_rng(0)
    protos = rng.random((10, 784)).astype(np.float32)
    n = 2048
    y = (np.arange(n) % 10).astype(np.int32)
    x = np.clip(protos[y] + 0.15 * rng.standard_normal((n, 784)), 0, 1)
    x = x.astype(np.float32)
    tl = ArrayDataLoader(x[:1536], y[:1536], 256, shuffle=True,
                         encode_config=enc, seed=0)
    vl = ArrayDataLoader(x[1536:], y[1536:], 256, shuffle=False,
                         encode_config=enc)

    t0 = time.time()
    tr = Trainer(cfg, checkpoint_folder="/tmp/drive_deep_ckpt", seed=3)
    hist = tr.fit(tl, vl, nb_epochs=8, force_overwrite=True, verbose=True)
    acc = float(tr.compute_classification_accuracy(vl))
    print(f"plain deep fit: {time.time()-t0:.1f}s train_loss "
          f"{hist['train'][0]:.4f}->{hist['train'][-1]:.4f} val_acc {acc:.3f}")
    assert hist["train"][-1] < hist["train"][0] * 0.7, "loss did not drop"
    assert acc > 0.5, f"accuracy {acc} not above chance margin"

    # Count-regularized deep fit: the mid-head _counts kernel path.
    t0 = time.time()
    tr2 = Trainer(cfg, checkpoint_folder="/tmp/drive_deep_ckpt_reg", seed=3,
                  reg_fn=L.L2SpikesPerNeuron(1e-5))
    hist2 = tr2.fit(tl, vl, nb_epochs=4, force_overwrite=True, verbose=False)
    acc2 = float(tr2.compute_classification_accuracy(vl))
    print(f"count-reg deep fit: {time.time()-t0:.1f}s train_loss "
          f"{hist2['train'][0]:.4f}->{hist2['train'][-1]:.4f} "
          f"val_acc {acc2:.3f}")
    assert hist2["train"][-1] < hist2["train"][0], "reg fit loss flat"
    assert acc2 > 0.5

    print("DRIVE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
