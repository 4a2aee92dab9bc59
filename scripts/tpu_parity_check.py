"""On-TPU parity check: natively-compiled Pallas kernels vs the XLA scan
path, forward and BPTT gradients.

The pytest suite runs on CPU (interpret mode); this script is the
hardware counterpart -- run it on a real TPU to validate the Mosaic
compilation end to end:

    python scripts/tpu_parity_check.py

Exits non-zero on any mismatch.  Expect a few minutes of compile time on
first run.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, got, ref, atol=1e-5, rtol=1e-4):
    got, ref = np.asarray(got), np.asarray(ref)
    ok = np.allclose(got, ref, atol=atol, rtol=rtol)
    diff = float(np.max(np.abs(got - ref))) if got.shape == ref.shape else "shape!"
    print(f"{'OK  ' if ok else 'FAIL'} {name}: max|diff|={diff}")
    return ok


def main():
    from snnimageclassification_tpu.models import snn as M
    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from snnimageclassification_tpu.models.config import SNNConfig

    if jax.default_backend() != "tpu":
        print(f"not a TPU backend ({jax.default_backend()}); nothing to check")
        return 0

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((64, 784)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, 64), jnp.int32)
    ok = True

    for name, kw in {
        "ff_lif": dict(hidden_layer_type="LIF", use_recurrent_connection=False),
        "ff_alif": dict(hidden_layer_type="ALIF", use_recurrent_connection=False),
        "rec_alif_learnbeta": dict(
            hidden_layer_type="ALIF", use_recurrent_connection=True,
            learn_beta=True,
        ),
        "rec_lif": dict(hidden_layer_type="LIF", use_recurrent_connection=True),
        "rec_izh": dict(
            hidden_layer_type="Izhikevich", use_recurrent_connection=True,
        ),
        # Multi-hidden: layer 1 routes through the fused mid-layer kernel
        # (z@W + scan in one kernel, ops/pallas_fused_mid.py).
        "rec_alif_2layer": dict(
            hidden_layer_type="ALIF", use_recurrent_connection=True,
            n_hidden_neurons=[128, 128],
        ),
        "ff_lif_2layer": dict(
            hidden_layer_type="LIF", use_recurrent_connection=False,
            n_hidden_neurons=[128, 96],
        ),
    }.items():
        base = dict(
            input_size=784, output_size=10,
            int_time_steps=12,
        )
        if "n_hidden_neurons" not in kw:
            base["n_hidden_neurons"] = 128
        cfg_pal = SNNConfig(**base, **kw, use_pallas=True)
        cfg_xla = SNNConfig(**base, **kw, use_pallas=False)
        params = M.init(cfg_pal, jax.random.PRNGKey(0))

        def loss(cfg, p):
            logits = M.forward_logits(cfg, p, x)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(64), y])

        f_pal = jax.jit(lambda p: loss(cfg_pal, p))
        f_xla = jax.jit(lambda p: loss(cfg_xla, p))
        ok &= check(f"{name} loss", f_pal(params), f_xla(params), atol=1e-5)
        g_pal = jax.jit(jax.grad(lambda p: loss(cfg_pal, p)))(params)
        g_xla = jax.jit(jax.grad(lambda p: loss(cfg_xla, p)))(params)
        for path, gp in jax.tree_util.tree_leaves_with_path(g_pal):
            gx = g_xla
            for k in path:
                gx = gx[k.key]
            ok &= check(f"{name} grad {jax.tree_util.keystr(path)}", gp, gx,
                        atol=1e-5)
    # Fused encode+matmul path (apply_pixels) vs encode-then-apply.
    from snnimageclassification_tpu.data.datasets import EncodeConfig
    from snnimageclassification_tpu.ops.encoding import encode_spikes

    fused_variants = {
        "alif-rec-learnbeta": dict(
            hidden_layer_type="ALIF", use_recurrent_connection=True,
            learn_beta=True,
        ),
        "alif-ff": dict(
            hidden_layer_type="ALIF", use_recurrent_connection=False,
        ),
        "lif-rec": dict(
            hidden_layer_type="LIF", use_recurrent_connection=True,
        ),
        "lif-ff": dict(
            hidden_layer_type="LIF", use_recurrent_connection=False,
        ),
        # ALIF+Phi: the only head-kernel branch that stores the adaptation
        # trace (n_trace=2) and uses the dynamic-threshold surrogate scale.
        "alif-rec-phi": dict(
            hidden_layer_type="ALIF", use_recurrent_connection=True,
            spike_func="Phi",
        ),
    }
    # n_steps=12 runs in ONE time block (K=12); n_steps=24 forces TWO
    # blocks through the K-step-blocked kernels -- this caught a real bug
    # where the fused backward regenerated spike rows with the reverse
    # grid index instead of the forward block index.
    for vname, vkw in fused_variants.items():
        for use_periods, n_steps in ((False, 12), (True, 12), (False, 24), (True, 24)):
            cfg = SNNConfig(
                input_size=784, output_size=10, n_hidden_neurons=128,
                int_time_steps=n_steps, **vkw,
            )
            params = M.init(cfg, jax.random.PRNGKey(1))
            enc = EncodeConfig(n_steps=n_steps, use_periods=use_periods)

            def loss_fused(p, cfg=cfg, enc=enc):
                trace, _ = M.apply_pixels(cfg, p, x, enc)
                logits = M.prediction_logits(cfg, trace)
                return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])

            def loss_ref(p, cfg=cfg, enc=enc):
                spikes = encode_spikes(x, n_steps=enc.n_steps,
                                       use_periods=enc.use_periods)
                logits = M.forward_logits(cfg, p, spikes)
                return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])

            def loss_head(p, cfg=cfg, enc=enc):
                logits = M.forward_logits_pixels(cfg, p, x, enc)
                return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])

            name = f"fused_encode {vname} periods={use_periods} T={n_steps}"
            ok &= check(f"{name} loss", jax.jit(loss_fused)(params),
                        jax.jit(loss_ref)(params), atol=1e-5)
            # Whole-network head fusion (encode+scan+readout+max in one
            # kernel pair) for these single-hidden-layer configs.
            ok &= check(f"{name} head loss", jax.jit(loss_head)(params),
                        jax.jit(loss_ref)(params), atol=1e-5)
            gf = jax.jit(jax.grad(loss_fused))(params)
            gr = jax.jit(jax.grad(loss_ref))(params)
            gh = jax.jit(jax.grad(loss_head))(params)
            for path, gp in jax.tree_util.tree_leaves_with_path(gf):
                gx, ghh = gr, gh
                for k in path:
                    gx = gx[k.key]
                    ghh = ghh[k.key]
                ok &= check(f"{name} grad {jax.tree_util.keystr(path)}", gp, gx,
                            atol=1e-4)
                ok &= check(f"{name} head grad {jax.tree_util.keystr(path)}",
                            ghh, gx, atol=1e-4)
            # Inference primal (store_traces=False: no residual trace
            # leaves the kernel) must stay BITWISE equal to the
            # residual-storing f_fwd forward the training path runs.
            infer_logits = jax.jit(
                lambda p, cfg=cfg, enc=enc: M.forward_logits_pixels(
                    cfg, p, x, enc
                )
            )(params)
            fwd_logits = jax.jit(
                lambda p, cfg=cfg, enc=enc: jax.vjp(
                    lambda pp: M.forward_logits_pixels(cfg, pp, x, enc), p
                )[0]
            )(params)
            ok &= check(f"{name} infer==train logits", infer_logits,
                        fwd_logits, atol=0.0, rtol=0.0)

    # Head+counts kernels (ops/pallas_fused.py _counts variants): the
    # fused-path spike-regularization carrier.  Regularized loss + grads
    # through forward_logits_counts_pixels (whole-network kernel pair with
    # a counts output) vs the XLA trace path (use_pallas=False,
    # return_hidden + masked traces) -- the Trainer's two reg routes.
    from snnimageclassification_tpu.train import losses as losses_mod

    w_ones = jnp.ones((64,), jnp.float32)
    for vname, vkw in (
        ("alif-rec", dict(hidden_layer_type="ALIF",
                          use_recurrent_connection=True)),
        ("lif-ff", dict(hidden_layer_type="LIF",
                        use_recurrent_connection=False)),
    ):
        for reg_name, reg_obj in (
            ("l1", losses_mod.L1TotalSpikeCount(1e-4)),
            ("l2", losses_mod.L2SpikesPerNeuron(1e-4)),
        ):
            for n_steps in (12, 24):
                cfg = SNNConfig(
                    input_size=784, output_size=10, n_hidden_neurons=128,
                    int_time_steps=n_steps, **vkw,
                )
                cfg_xla = SNNConfig(
                    input_size=784, output_size=10, n_hidden_neurons=128,
                    int_time_steps=n_steps, use_pallas=False, **vkw,
                )
                params = M.init(cfg, jax.random.PRNGKey(4))
                enc = EncodeConfig(n_steps=n_steps, use_periods=True)

                def loss_counts(p, cfg=cfg, enc=enc, reg=reg_obj):
                    logits, counts = M.forward_logits_counts_pixels(
                        cfg, p, x, enc
                    )
                    nll = -jnp.mean(
                        jax.nn.log_softmax(logits)[jnp.arange(64), y]
                    )
                    return nll + reg.from_counts(counts, w_ones)

                def loss_traces(p, cfg=cfg_xla, enc=enc, reg=reg_obj):
                    trace, hidden = M.apply_pixels(
                        cfg, p, x, enc, return_hidden=True
                    )
                    logits = M.prediction_logits(cfg, trace)
                    nll = -jnp.mean(
                        jax.nn.log_softmax(logits)[jnp.arange(64), y]
                    )
                    return nll + reg(hidden)

                name = f"head_counts {vname} {reg_name} T={n_steps}"
                ok &= check(f"{name} loss", jax.jit(loss_counts)(params),
                            jax.jit(loss_traces)(params), atol=1e-5)
                gc_ = jax.jit(jax.grad(loss_counts))(params)
                gt_ = jax.jit(jax.grad(loss_traces))(params)
                for path, gp in jax.tree_util.tree_leaves_with_path(gc_):
                    gx = gt_
                    for kk in path:
                        gx = gx[kk.key]
                    ok &= check(
                        f"{name} grad {jax.tree_util.keystr(path)}", gp, gx,
                        atol=1e-4,
                    )

    # DEEP-network head fusion (ops/pallas_fused_mid.py head variants):
    # >= 2 hidden layers run layer-0 fused -> mid kernels -> the mid-HEAD
    # kernel (last hidden + readout + max in one pair).  Compare
    # forward_logits_pixels (deep dispatch) against the composed
    # apply_pixels -> prediction_logits path and the all-XLA path, loss +
    # grads, at one- and two-block T; plus the counts variant and the
    # bitwise inference-primal check.
    for vname, vkw in (
        ("alif-rec-2h", dict(hidden_layer_type="ALIF",
                             use_recurrent_connection=True,
                             n_hidden_neurons=[128, 128])),
        ("lif-ff-3h", dict(hidden_layer_type="LIF",
                           use_recurrent_connection=False,
                           n_hidden_neurons=[128, 128, 96])),
    ):
        for n_steps in (12, 24):
            cfg = SNNConfig(
                input_size=784, output_size=10, int_time_steps=n_steps,
                **vkw,
            )
            cfg_xla = SNNConfig(
                input_size=784, output_size=10, int_time_steps=n_steps,
                use_pallas=False, **vkw,
            )
            # 2-hidden configs route through the round-5 fused2
            # whole-network pair (ops/pallas_fused2.py); >= 3 hidden
            # through layer-0-fused -> mid -> mid-head.  These legs
            # therefore cover BOTH deep dispatches natively.
            if len(cfg.layer_configs) == 3:
                assert M._twolayer_head_fusible(
                    cfg, EncodeConfig(n_steps=n_steps)
                ), f"twolayer gate unexpectedly off for {vname}"
            else:
                assert M._deep_head_fusible(
                    cfg, EncodeConfig(n_steps=n_steps)
                ), f"deep gate unexpectedly off for {vname}"
            params = M.init(cfg, jax.random.PRNGKey(5))
            enc = EncodeConfig(n_steps=n_steps, use_periods=True)

            def loss_deep(p, cfg=cfg, enc=enc):
                logits = M.forward_logits_pixels(cfg, p, x, enc)
                return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])

            def loss_composed(p, cfg=cfg, enc=enc):
                trace, _ = M.apply_pixels(cfg, p, x, enc)
                logits = M.prediction_logits(cfg, trace)
                return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])

            def loss_xla(p, cfg=cfg_xla, enc=enc):
                trace, _ = M.apply_pixels(cfg, p, x, enc)
                logits = M.prediction_logits(cfg, trace)
                return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])

            name = f"deep_head {vname} T={n_steps}"
            ld = jax.jit(loss_deep)(params)
            ok &= check(f"{name} loss vs composed", ld,
                        jax.jit(loss_composed)(params), atol=1e-5)
            ok &= check(f"{name} loss vs xla", ld,
                        jax.jit(loss_xla)(params), atol=1e-5)
            gd = jax.jit(jax.grad(loss_deep))(params)
            gx_ = jax.jit(jax.grad(loss_xla))(params)
            for path, gp in jax.tree_util.tree_leaves_with_path(gd):
                gxx = gx_
                for kk in path:
                    gxx = gxx[kk.key]
                ok &= check(f"{name} grad {jax.tree_util.keystr(path)}",
                            gp, gxx, atol=1e-4)
            # counts variant: regularized loss through the mid-head
            # _counts kernel vs the XLA trace route.
            reg = losses_mod.L2SpikesPerNeuron(1e-4)

            def loss_counts(p, cfg=cfg, enc=enc, reg=reg):
                logits, counts = M.forward_logits_counts_pixels(
                    cfg, p, x, enc
                )
                nll = -jnp.mean(
                    jax.nn.log_softmax(logits)[jnp.arange(64), y]
                )
                return nll + reg.from_counts(counts, w_ones)

            def loss_traces(p, cfg=cfg_xla, enc=enc, reg=reg):
                trace, hidden = M.apply_pixels(
                    cfg, p, x, enc, return_hidden=True
                )
                logits = M.prediction_logits(cfg, trace)
                nll = -jnp.mean(
                    jax.nn.log_softmax(logits)[jnp.arange(64), y]
                )
                return nll + reg(hidden)

            ok &= check(f"{name} counts loss", jax.jit(loss_counts)(params),
                        jax.jit(loss_traces)(params), atol=1e-5)
            gc_ = jax.jit(jax.grad(loss_counts))(params)
            gt_ = jax.jit(jax.grad(loss_traces))(params)
            for path, gp in jax.tree_util.tree_leaves_with_path(gc_):
                gxx = gt_
                for kk in path:
                    gxx = gxx[kk.key]
                ok &= check(
                    f"{name} counts grad {jax.tree_util.keystr(path)}",
                    gp, gxx, atol=1e-4,
                )
            # Inference primal bitwise vs the f_fwd training forward.
            infer_logits = jax.jit(
                lambda p, cfg=cfg, enc=enc: M.forward_logits_pixels(
                    cfg, p, x, enc
                )
            )(params)
            fwd_logits = jax.jit(
                lambda p, cfg=cfg, enc=enc: jax.vjp(
                    lambda pp: M.forward_logits_pixels(cfg, pp, x, enc), p
                )[0]
            )(params)
            ok &= check(f"{name} infer==train logits", infer_logits,
                        fwd_logits, atol=0.0, rtol=0.0)

    # Fused encode+Izhikevich layer-0 (ops/pallas_fused_izh.py): the
    # model routes Izhikevich first layers through apply_pixels'
    # layer0_fused path; compare against encode-then-apply like above.
    for rec in (True, False):
        for use_periods, n_steps in ((False, 12), (True, 24)):
            cfg = SNNConfig(
                input_size=784, output_size=10, n_hidden_neurons=128,
                int_time_steps=n_steps, hidden_layer_type="Izhikevich",
                use_recurrent_connection=rec,
            )
            params = M.init(cfg, jax.random.PRNGKey(2))
            enc = EncodeConfig(n_steps=n_steps, use_periods=use_periods)
            # Izhikevich needs ~1e6-scale currents to spike; scale W_in.
            params = dict(params)
            params["input"] = dict(
                params["input"], w_in=params["input"]["w_in"] * 3e6
            )

            def loss_fused(p, cfg=cfg, enc=enc):
                trace, _ = M.apply_pixels(cfg, p, x, enc)
                logits = M.prediction_logits(cfg, trace)
                return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])

            def loss_ref(p, cfg=cfg, enc=enc):
                spikes = encode_spikes(x, n_steps=enc.n_steps,
                                       use_periods=enc.use_periods)
                logits = M.forward_logits(cfg, p, spikes)
                return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])

            def loss_head(p, cfg=cfg, enc=enc):
                # Routes through the whole-network Izhikevich head kernel
                # (ops/pallas_fused_izh.py head variants).
                logits = M.forward_logits_pixels(cfg, p, x, enc)
                return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])

            name = f"fused_izh rec={rec} periods={use_periods} T={n_steps}"
            ok &= check(f"{name} loss", jax.jit(loss_fused)(params),
                        jax.jit(loss_ref)(params), atol=1e-5)
            ok &= check(f"{name} head loss", jax.jit(loss_head)(params),
                        jax.jit(loss_ref)(params), atol=1e-5)
            gf = jax.jit(jax.grad(loss_fused))(params)
            gr = jax.jit(jax.grad(loss_ref))(params)
            gh = jax.jit(jax.grad(loss_head))(params)
            for path, gp in jax.tree_util.tree_leaves_with_path(gf):
                gx, ghh = gr, gh
                for kk in path:
                    gx = gx[kk.key]
                    ghh = ghh[kk.key]
                ok &= check(f"{name} grad {jax.tree_util.keystr(path)}",
                            gp, gx, atol=1e-4)
                ok &= check(f"{name} head grad {jax.tree_util.keystr(path)}",
                            ghh, gx, atol=1e-4)

    # Stacked-replica ensemble grid (ops/pallas_fused.py _stack_spec):
    # all replicas as ONE kernel pair must match per-replica unrolled
    # head calls bitwise -- this is the EnsembleTrainer fused path.
    S = 4
    for vname, vkw, n_steps, use_periods in (
        ("alif-rec-learnbeta", dict(hidden_layer_type="ALIF",
                                    use_recurrent_connection=True,
                                    learn_beta=True), 24, True),
        ("lif-ff", dict(hidden_layer_type="LIF",
                        use_recurrent_connection=False), 12, False),
    ):
        cfg = SNNConfig(
            input_size=784, output_size=10, n_hidden_neurons=128,
            int_time_steps=n_steps, **vkw,
        )
        enc = EncodeConfig(n_steps=n_steps, use_periods=use_periods)
        plist = [M.init(cfg, jax.random.PRNGKey(10 + i)) for i in range(S)]
        stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *plist)

        def loss_stacked(p, cfg=cfg, enc=enc):
            logits = M.forward_logits_pixels_stacked(cfg, p, x, enc)
            return jnp.sum(jax.vmap(
                lambda lg: -jnp.mean(
                    jax.nn.log_softmax(lg)[jnp.arange(64), y]
                )
            )(logits))

        def loss_unrolled(p, cfg=cfg, enc=enc):
            tot = 0.0
            for i in range(S):
                p_i = jax.tree.map(lambda a, i=i: a[i], p)
                lg = M.forward_logits_pixels(cfg, p_i, x, enc)
                tot = tot - jnp.mean(
                    jax.nn.log_softmax(lg)[jnp.arange(64), y]
                )
            return tot

        name = f"stacked_ensemble {vname} periods={use_periods} T={n_steps}"
        ok &= check(f"{name} loss", jax.jit(loss_stacked)(stacked),
                    jax.jit(loss_unrolled)(stacked), atol=1e-5)
        gs = jax.jit(jax.grad(loss_stacked))(stacked)
        gu = jax.jit(jax.grad(loss_unrolled))(stacked)
        for path, gp in jax.tree_util.tree_leaves_with_path(gs):
            gx = gu
            for k in path:
                gx = gx[k.key]
            ok &= check(f"{name} grad {jax.tree_util.keystr(path)}", gp, gx,
                        atol=1e-5)

    # Izhikevich stacked-replica head (ops/pallas_fused_izh.py stacked grid
    # lifting): same one-kernel-pair-for-all-seeds contract as LIF/ALIF.
    for rec, n_steps in ((True, 24), (False, 12)):
        cfg = SNNConfig(
            input_size=784, output_size=10, n_hidden_neurons=128,
            int_time_steps=n_steps, hidden_layer_type="Izhikevich",
            use_recurrent_connection=rec,
        )
        enc = EncodeConfig(n_steps=n_steps, use_periods=False)
        plist = []
        for i in range(S):
            p = dict(M.init(cfg, jax.random.PRNGKey(20 + i)))
            # Izhikevich needs ~1e6-scale currents to spike; scale W_in.
            p["input"] = dict(p["input"], w_in=p["input"]["w_in"] * 3e6)
            plist.append(p)
        stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *plist)

        def loss_stacked(p, cfg=cfg, enc=enc):
            logits = M.forward_logits_pixels_stacked(cfg, p, x, enc)
            return jnp.sum(jax.vmap(
                lambda lg: -jnp.mean(
                    jax.nn.log_softmax(lg)[jnp.arange(64), y]
                )
            )(logits))

        def loss_unrolled(p, cfg=cfg, enc=enc):
            tot = 0.0
            for i in range(S):
                p_i = jax.tree.map(lambda a, i=i: a[i], p)
                lg = M.forward_logits_pixels(cfg, p_i, x, enc)
                tot = tot - jnp.mean(
                    jax.nn.log_softmax(lg)[jnp.arange(64), y]
                )
            return tot

        name = f"stacked_izh rec={rec} T={n_steps}"
        ok &= check(f"{name} loss", jax.jit(loss_stacked)(stacked),
                    jax.jit(loss_unrolled)(stacked), atol=1e-5)
        gs = jax.jit(jax.grad(loss_stacked))(stacked)
        gu = jax.jit(jax.grad(loss_unrolled))(stacked)
        for path, gp in jax.tree_util.tree_leaves_with_path(gs):
            gx = gu
            for k in path:
                gx = gx[k.key]
            ok &= check(f"{name} grad {jax.tree_util.keystr(path)}", gp, gx,
                        atol=1e-4)

    # Izhikevich + count regularization: the model path returns EMPTY
    # counts (the reference's isinstance(LIFLayer) filter excludes
    # Izhikevich, snn.py:268) via the FUSED head, matching the XLA trace
    # path with the same cfg-aware exclusion; and the beyond-reference
    # counts kernel (fused_encode_izh_scan_head_counts) must agree with
    # the layer kernel's summed z trace in values and gradients.
    for rec in (True, False):
        n_steps = 24
        cfg = SNNConfig(
            input_size=784, output_size=10, n_hidden_neurons=128,
            int_time_steps=n_steps, hidden_layer_type="Izhikevich",
            use_recurrent_connection=rec,
        )
        cfg_xla = SNNConfig(
            input_size=784, output_size=10, n_hidden_neurons=128,
            int_time_steps=n_steps, hidden_layer_type="Izhikevich",
            use_recurrent_connection=rec, use_pallas=False,
        )
        params = dict(M.init(cfg, jax.random.PRNGKey(6)))
        params["input"] = dict(
            params["input"], w_in=params["input"]["w_in"] * 3e6
        )
        enc = EncodeConfig(n_steps=n_steps, use_periods=False)
        reg_c = losses_mod.L1TotalSpikeCount(1e-4, cfg=cfg)
        reg_t = losses_mod.L1TotalSpikeCount(1e-4, cfg=cfg_xla)

        def loss_counts(p, cfg=cfg, enc=enc, reg=reg_c):
            logits, counts = M.forward_logits_counts_pixels(cfg, p, x, enc)
            nll = -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])
            return nll + reg.from_counts(counts, w_ones)

        def loss_traces(p, cfg=cfg_xla, enc=enc, reg=reg_t):
            trace, hidden = M.apply_pixels(cfg, p, x, enc,
                                           return_hidden=True)
            logits = M.prediction_logits(cfg, trace)
            nll = -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(64), y])
            return nll + reg(hidden)

        name = f"izh_counts_empty rec={rec} T={n_steps}"
        ok &= check(f"{name} loss", jax.jit(loss_counts)(params),
                    jax.jit(loss_traces)(params), atol=1e-5)
        gc_ = jax.jit(jax.grad(loss_counts))(params)
        gt_ = jax.jit(jax.grad(loss_traces))(params)
        for path, gp in jax.tree_util.tree_leaves_with_path(gc_):
            gx = gt_
            for kk in path:
                gx = gx[kk.key]
            ok &= check(f"{name} grad {jax.tree_util.keystr(path)}", gp, gx,
                        atol=1e-4)

        # Beyond-reference izh counts kernel: counts == sum_t z natively,
        # grads of a counts objective == the layer-kernel-trace objective.
        from snnimageclassification_tpu.ops.cells import ReadoutConfig
        from snnimageclassification_tpu.ops.encoding import (
            pixels_to_firing_periods,
        )
        from snnimageclassification_tpu.ops.pallas_fused_izh import (
            fused_encode_izh_scan,
            fused_encode_izh_scan_head_counts,
        )
        from snnimageclassification_tpu.ops.pallas_izh import (
            izh_kernel_params,
        )

        lat = pixels_to_firing_periods(x, t_max=float(n_steps))
        kp = izh_kernel_params(dict(cfg.layer_configs)["input"])
        kappa = ReadoutConfig(input_size=128, output_size=10).kappa
        w_in_k = params["input"]["w_in"]
        w_rec_k = (
            params["input"]["w_rec"] * (1 - jnp.eye(128)) if rec else None
        )
        w_out_k = params["readout"]["w_in"]
        b_out_k = params["readout"]["b"]
        icfg = dict(cfg.layer_configs)["input"]
        common = (kp, n_steps, False, icfg.gamma, kappa, icfg.spike_func)
        _, cnts = jax.jit(
            lambda wi, wr, wo, bo: fused_encode_izh_scan_head_counts(
                lat, wi, wr, wo, bo, *common
            )
        )(w_in_k, w_rec_k, w_out_k, b_out_k)
        z_tr = jax.jit(
            lambda wi, wr: fused_encode_izh_scan(
                lat, wi, wr, kp, n_steps, False, icfg.gamma,
                icfg.spike_func,
            )
        )(w_in_k, w_rec_k)
        ok &= check(f"izh_counts_kernel rec={rec} counts==sum_t z", cnts,
                    jnp.sum(z_tr, axis=0), atol=0.0)

    # uint8 wire parity (serve.py): a uint8 server normalizing on device
    # (x.astype(f32)/255 inside the compiled program) must produce logits
    # BIT-equal to a float32 server fed host-normalized x/255 -- the
    # native leg of the serve.py docstring claim.
    from snnimageclassification_tpu.serve import InferenceServer

    cfg = SNNConfig(
        input_size=784, output_size=10, n_hidden_neurons=128,
        int_time_steps=12, hidden_layer_type="ALIF",
        use_recurrent_connection=True,
    )
    params = M.init(cfg, jax.random.PRNGKey(3))
    enc = EncodeConfig(n_steps=12)
    px_u8 = np.asarray(rng.integers(0, 256, (64, 784)), np.uint8)
    with InferenceServer(cfg, params, batch_size=64,
                         encode_config=enc) as s_f32:
        ref_logits = s_f32.submit(px_u8.astype(np.float32) / 255.0).result()
    with InferenceServer(cfg, params, batch_size=64, encode_config=enc,
                         input_dtype=np.uint8) as s_u8:
        u8_logits = s_u8.submit(px_u8).result()
    ok &= check("uint8 wire == f32/255 server logits", u8_logits, ref_logits,
                atol=0.0, rtol=0.0)

    print("PARITY", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
