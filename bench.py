"""Benchmark: stereo pairs/sec/chip, LowCNN_gru (12 GRU iterations) at the
reference's evaluation resolution 576×960 (SceneflowLoader.py:124-130;
per-image inference timing trainer_DLC_GRU.py:255-265; test_batch=4|8 per
trainer_DLC_GRU.py:46).

Prints ONE JSON line:
  {"metric": "pairs_per_sec_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": N, ...}

The headline value is the bf16-activation eval path (params f32,
probability/coordinate math f32 — the deployment configuration) and is
only used if the bf16 disparities agree with the f32 path within 0.25 px
mean absolute difference on the benchmark input; otherwise the f32
number is reported.  Both appear in the record.

vs_baseline: the reference publishes no numbers anywhere (BASELINE.md), so
the denominator is an ASSUMED literature figure — RAFT-style 12-iteration
refinement nets run ≈10 pairs/s at this resolution on a V100-class GPU.
The JSON carries "baseline": "assumed" to say so.  BASELINE.json's target
is ≥3× per chip, i.e. vs_baseline ≥ 3.0 means target met.

Compile-budget protocol: cold remote compiles through the axon tunnel cost
minutes, and the driver runs this script under a time budget.  A
persistent XLA compilation cache (.xla_cache/) makes warm compiles ~20 s;
a marker file records which GRU loop mode has been pre-warmed.  With no
warm cache the script falls back to loop="scan" (same numerics, ~4×
cheaper cold compile, slower steady state) rather than blowing the budget
and reporting nothing.  Override with BENCH_MODE=unroll|scan.
"""

from __future__ import annotations

import json
import os
import sys
import time

_T0 = time.perf_counter()


def _phase(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)

BASELINE_PAIRS_PER_SEC_GPU = 10.0  # assumed, not measured (see docstring)
# bf16 matmul peak of one TPU v5 lite chip, for the MFU denominator
V5E_BF16_PEAK_TFLOPS = 197.0

H, W = 576, 960
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
ITERS = 12
BF16_AGREEMENT_PX = 0.25


def _marker(cache_dir: str, mode: str) -> str:
    return os.path.join(cache_dir, f"BENCH_WARM_{mode}_{H}x{W}_b{BATCH}_i{ITERS}")


def main():
    from stereoformer_tpu.utils import enable_persistent_cache

    cache_dir = enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stereoformer_tpu.models import get_model

    mode = os.environ.get("BENCH_MODE", "")
    if mode not in ("unroll", "scan"):
        mode = "unroll" if os.path.exists(_marker(cache_dir, "unroll")) else "scan"

    _phase(f"imports done, mode={mode}, devices={jax.devices()}")

    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(BATCH, H, W, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(BATCH, H, W, 3).astype(np.float32))

    results = {}
    disp_maps = {}
    for dtype_name in ("f32", "bf16"):
        kw = {"loop": mode}
        if dtype_name == "bf16":
            kw["dtype"] = jnp.bfloat16
        model = get_model("LowCNN_gru", **kw)
        variables = jax.jit(
            lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1,
                                    train=False)
        )(left, right)
        _phase(f"{dtype_name}: model init done")

        def infer_fn(v, l, r):
            return model.apply(v, l, r, iters=ITERS, train=False)[
                "disparities"][-1]

        compiled = jax.jit(infer_fn).lower(variables, left, right).compile()
        _phase(f"{dtype_name}: infer compiled")

        # FLOPs of the eval forward, from XLA's own cost model (may be
        # unavailable on some PJRT transports — then flops fields omitted)
        flops_per_pair = None
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            f = float(cost.get("flops", 0.0))
            if f > 0:
                flops_per_pair = f / BATCH
        except Exception:
            pass

        # warmup (float() forces a real host sync; block_until_ready does
        # not round-trip through every PJRT transport)
        disp_maps[dtype_name] = np.asarray(compiled(variables, left, right))
        _phase(f"{dtype_name}: warmup 1 done")
        float(jnp.sum(compiled(variables, left, right)))
        _phase(f"{dtype_name}: warmup 2 done")

        # pipelined steady-state: dispatch all reps, sync once — the device
        # queue serialises execution, so total/reps is true per-batch time
        reps = 20
        t0 = time.perf_counter()
        outs = [compiled(variables, left, right) for _ in range(reps)]
        float(jnp.sum(outs[-1]))
        dt = time.perf_counter() - t0
        outs = None  # free ~350 MB of queued eval outputs before later stages
        results[dtype_name] = {
            "pairs_per_sec": reps * BATCH / dt,
            "flops_per_pair": flops_per_pair,
        }
        _phase(f"{dtype_name}: {results[dtype_name]['pairs_per_sec']:.1f} pairs/s")

    # mark this mode as compile-warm for future runs
    try:
        with open(_marker(cache_dir, mode), "w") as fh:
            fh.write(f"{time.time()}\n")
    except OSError:
        pass

    # --- RAFT-Stereo rows: the Pallas-conv kernel path (fused conv +
    # norm-prologue fusion in the encoders/GRU cascade) must be
    # driver-certified, not builder-self-reported (round-2 verdict #3).
    # eval B=2 @ 576x960 12 iters test_mode; train step B=4 @ 320x720.
    # BENCH_RAFT=0 skips (budget escape hatch).
    # Self-imposed wall budget: on this transport a fresh process can pay a
    # 5-15 min server-side first-execution cost per executable (observed
    # round 4), so a slow session could otherwise blow the driver's budget
    # AFTER the flagship rows were measured but BEFORE the JSON printed.
    # Skip remaining RAFT stages once the budget is tight; whatever was
    # measured still lands in the record.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1800"))

    def budget_left() -> float:
        return budget_s - (time.perf_counter() - _T0)

    # --- Flagship TRAIN-step rows (round-4 verdict #3: the 31 ms / 139
    # pairs/s training headline must be driver-certified, not taken from
    # the builder-run scripts/train_phase_bench.py).  Reference config of
    # record: bf16, crop 320x640, sequence loss, amsgrad-Adam, 12 GRU
    # iterations (scripts/run.sh:8-22, trainer_DLC_GRU.py:125-129);
    # B=4 (reference batch) and B=8 (the recommended single-chip config,
    # BENCHMARKS.md "train batch scan").  BENCH_TRAIN=0 skips.
    train_rows = {}
    if os.environ.get("BENCH_TRAIN", "1") != "0" and budget_left() > 60:
        try:
            import optax

            from stereoformer_tpu.losses import sequence_loss  # noqa: F401
            from stereoformer_tpu.train import TrainState, make_train_step

            tmodel = get_model("LowCNN_gru", dtype=jnp.bfloat16, loop=mode)
            Ht, Wt = 320, 640
            ttx = optax.amsgrad(1e-3)
            tstep = make_train_step(tmodel, ttx, "sequence", iters=ITERS)
            for Bt in (4, 8):
                if budget_left() < 60:
                    raise TimeoutError(
                        f"bench budget: {budget_left():.0f}s left")
                tl = jnp.asarray(rng.randn(Bt, Ht, Wt, 3).astype(np.float32))
                tr_ = jnp.asarray(rng.randn(Bt, Ht, Wt, 3).astype(np.float32))
                tg = jnp.asarray(
                    (40 + 10 * rng.randn(Bt, Ht, Wt, 1)).astype(np.float32))
                tvars = jax.jit(
                    lambda l, r: tmodel.init(jax.random.PRNGKey(0), l, r,
                                             iters=1, train=False)
                )(tl, tr_)
                tstate = jax.jit(
                    lambda v: TrainState(
                        step=jnp.asarray(0, jnp.int32),
                        params=v["params"],
                        batch_stats=v["batch_stats"],
                        opt_state=ttx.init(v["params"]),
                    )
                )(tvars)
                batch = {"img_left": tl, "img_right": tr_, "gt_disp": tg}
                _phase(f"lowcnn train B={Bt}: compiling")
                tstate, tm = tstep(tstate, batch)
                loss0 = float(tm["loss"])
                assert np.isfinite(loss0), loss0
                _phase(f"lowcnn train B={Bt}: compiled+warm")
                reps = 15
                t0 = time.perf_counter()
                for _ in range(reps):
                    tstate, tm = tstep(tstate, batch)
                float(tm["loss"])
                dt = (time.perf_counter() - t0) / reps
                train_rows[f"lowcnn_train_b{Bt}_ms_per_step"] = round(
                    dt * 1e3, 2)
                train_rows[f"lowcnn_train_b{Bt}_pairs_per_sec"] = round(
                    Bt / dt, 1)
                _phase(f"lowcnn train B={Bt}: {dt * 1e3:.2f} ms/step")
            train_rows["lowcnn_train_config"] = (
                f"bf16 @ {Ht}x{Wt} {ITERS} iters sequence-loss amsgrad"
            )
        except Exception as e:  # must not lose the already-measured rows
            train_rows["lowcnn_train_error"] = f"{type(e).__name__}: {e}"[:300]
        finally:
            # free the train state (params + amsgrad moments + batch,
            # ~350 MB) before the RAFT stages — holding it OOM'd the
            # RAFT B=4 @ 320x720 train step on the 16 GB chip
            tstate = tvars = tm = batch = tl = tr_ = tg = tstep = None  # noqa: F841

    raft = {}
    if os.environ.get("BENCH_RAFT", "1") != "0" and budget_left() > 60:
        try:
            import optax

            from stereoformer_tpu.models import RAFTStereo
            from stereoformer_tpu.losses import sequence_loss

            rmodel = RAFTStereo(dtype=jnp.bfloat16)
            Br, Hr, Wr = 2, H, W
            rl = jnp.asarray(rng.uniform(0, 255, (Br, Hr, Wr, 3)).astype(
                np.float32))
            rr = jnp.asarray(rng.uniform(0, 255, (Br, Hr, Wr, 3)).astype(
                np.float32))
            rparams = jax.jit(
                lambda k, a, b: rmodel.init(k, a, b, 12, None, True, False)
            )(jax.random.PRNGKey(0), rl, rr)
            rfwd = jax.jit(
                lambda p, a, b: rmodel.apply(
                    p, a, b, iters=12, test_mode=True, train=False
                )["disparities"][-1]
            )
            _phase("raft: eval compiling")
            y = rfwd(rparams, rl, rr)
            assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
            float(jnp.sum(y.astype(jnp.float32)))
            _phase("raft: eval compiled+warm")
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                y = rfwd(rparams, rl, rr)
            float(jnp.sum(y.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / reps
            raft["raft_eval_ms_per_batch"] = round(dt * 1e3, 2)
            raft["raft_eval_pairs_per_sec"] = round(Br / dt, 3)
            _phase(f"raft: eval {raft['raft_eval_pairs_per_sec']} pairs/s")

            # throughput batch B=8 (round-3 verdict #7: the headline
            # B=8 figure must be driver-certified, not self-reported)
            if budget_left() < 60:
                raise TimeoutError(f"bench budget: {budget_left():.0f}s left")
            B8 = 8
            rl8 = jnp.concatenate([rl] * (B8 // Br), axis=0)
            rr8 = jnp.concatenate([rr] * (B8 // Br), axis=0)
            _phase("raft: eval B=8 compiling")
            y = rfwd(rparams, rl8, rr8)
            float(jnp.sum(y.astype(jnp.float32)))
            _phase("raft: eval B=8 compiled+warm")
            t0 = time.perf_counter()
            reps = 10
            for _ in range(reps):
                y = rfwd(rparams, rl8, rr8)
            float(jnp.sum(y.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / reps
            raft["raft_eval_b8_ms_per_batch"] = round(dt * 1e3, 2)
            raft["raft_eval_b8_pairs_per_sec"] = round(B8 / dt, 3)
            _phase(f"raft: eval B=8 {raft['raft_eval_b8_pairs_per_sec']} "
                   f"pairs/s")

            if budget_left() < 60:
                raise TimeoutError(f"bench budget: {budget_left():.0f}s left")
            Bt, Ht, Wt = 4, 320, 720
            tl = jnp.asarray(rng.uniform(0, 255, (Bt, Ht, Wt, 3)).astype(
                np.float32))
            tr_ = jnp.asarray(rng.uniform(0, 255, (Bt, Ht, Wt, 3)).astype(
                np.float32))
            tgt = jnp.asarray(rng.uniform(0, 192, (Bt, Ht, Wt, 1)).astype(
                np.float32))
            tvars = jax.jit(
                lambda k, a, b: rmodel.init(k, a, b, 12, None, False, True)
            )(jax.random.PRNGKey(0), tl, tr_)
            tparams = tvars["params"]
            tbs = tvars.get("batch_stats", {})
            tx = optax.adam(2e-4)
            topt = jax.jit(tx.init)(tparams)

            def rstep(params, bstats, opt_state, l, r, g):
                def loss_fn(p):
                    out, nv = rmodel.apply(
                        {"params": p, "batch_stats": bstats}, l, r,
                        iters=12, train=True, mutable=["batch_stats"],
                    )
                    return sequence_loss(out["disparities"], g), nv

                (loss, nv), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, nv["batch_stats"], opt_state, loss

            jstep = jax.jit(rstep, donate_argnums=(0, 1, 2))
            _phase("raft: train step compiling")
            tparams, tbs, topt, loss = jstep(tparams, tbs, topt, tl, tr_, tgt)
            float(loss)
            _phase("raft: train step compiled+warm")
            t0 = time.perf_counter()
            reps = 15
            for _ in range(reps):
                tparams, tbs, topt, loss = jstep(
                    tparams, tbs, topt, tl, tr_, tgt)
            float(loss)
            dt = (time.perf_counter() - t0) / reps
            raft["raft_train_ms_per_step"] = round(dt * 1e3, 2)
            raft["raft_train_pairs_per_sec"] = round(Bt / dt, 3)
            raft["raft_train_config"] = f"B={Bt} @ {Ht}x{Wt} 12 iters"
            _phase(f"raft: train {raft['raft_train_ms_per_step']} ms/step")
        except Exception as e:  # a RAFT failure must not lose the flagship row
            raft["raft_error"] = f"{type(e).__name__}: {e}"[:300]

    bf16_err = float(np.mean(np.abs(
        disp_maps["bf16"].astype(np.float64) -
        disp_maps["f32"].astype(np.float64))))
    headline = "bf16" if bf16_err <= BF16_AGREEMENT_PX else "f32"
    pairs_per_sec = results[headline]["pairs_per_sec"]

    record = {
        "metric": "pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC_GPU, 3),
        "baseline": "assumed",
        "mode": mode,
        "dtype": headline,
        "resolution": f"{H}x{W}",
        "batch": BATCH,
        "iters": ITERS,
        "f32_pairs_per_sec": round(results["f32"]["pairs_per_sec"], 3),
        "bf16_pairs_per_sec": round(results["bf16"]["pairs_per_sec"], 3),
        "bf16_vs_f32_mean_abs_disp_px": round(bf16_err, 4),
    }
    record.update(train_rows)
    record.update(raft)
    flops_per_pair = results[headline]["flops_per_pair"]
    if flops_per_pair is not None:
        achieved_tflops = flops_per_pair * pairs_per_sec / 1e12
        record["gflop_per_pair"] = round(flops_per_pair / 1e9, 1)
        record["achieved_tflops"] = round(achieved_tflops, 1)
        record["mfu_vs_bf16_peak"] = round(
            achieved_tflops / V5E_BF16_PEAK_TFLOPS, 4
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
