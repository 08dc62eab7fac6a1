"""Export a (trained) model to a serialized StableHLO serving artifact.

The reference's deployment unit is the training repo + a ``.pth``
(train_low.py:86-99); ours is ONE file a server runs with jax alone —
no model code, no flax, no checkpoint (see stereoformer_tpu/export.py).

Usage:
  python -m stereoformer_tpu.cli.export --ckpt saved/model_best \
      --net LowCNN_gru --height 576 --width 960 --iters 12 \
      --out lowcnn_gru_576x960.shlo [--batch 8] [--platforms tpu,cpu] \
      [--check]

``--batch 0`` (default) exports a symbolic batch dimension: one artifact,
any batch size.  Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser("stereoformer_tpu export")
    p.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint dir (params-only restore); omit for "
                        "randomly-initialised weights (pipeline tests)")
    p.add_argument("--net", type=str, default="LowCNN_gru")
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--batch", type=int, default=0,
                   help="0 = symbolic (any batch size at serve time)")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument("--loop", type=str, default="scan",
                   choices=("scan", "unroll"),
                   help="scan keeps the artifact small and serve-time "
                        "compiles fast; numerics are identical")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering targets (e.g. tpu,cpu); "
                        "default = current backend")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--check", action="store_true",
                   help="deserialize the artifact and compare against the "
                        "live model on random inputs")
    opt = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from .. import export as sfx
    from ..models import get_model
    from ..train import TrainState, restore_params
    from ..utils import get_logger

    logger = get_logger()

    model = get_model(opt.net, max_disp=opt.maxdisp, loop=opt.loop)
    dummy = jnp.zeros((1, opt.height, opt.width, 3), jnp.float32)
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1,
                                train=False)
    )(dummy, dummy)
    if opt.ckpt:
        tx = optax.amsgrad(1e-3)
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )
        state = restore_params(opt.ckpt, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logger.info("restored %s", opt.ckpt)

    platforms = opt.platforms.split(",") if opt.platforms else None
    exported = sfx.export_model(
        model, variables, opt.height, opt.width, iters=opt.iters,
        batch=(opt.batch or None), platforms=platforms,
    )
    nbytes = sfx.save_exported(exported, opt.out)

    record = {
        "artifact": opt.out,
        "bytes": nbytes,
        "net": opt.net,
        "resolution": f"{opt.height}x{opt.width}",
        "batch": opt.batch or "symbolic",
        "iters": opt.iters,
        "platforms": list(exported.platforms),
    }

    if opt.check:
        loaded = sfx.load_exported(opt.out)
        rng = np.random.RandomState(0)
        B = opt.batch or 2
        left = jnp.asarray(rng.randn(B, opt.height, opt.width, 3)
                           .astype(np.float32))
        right = jnp.asarray(rng.randn(B, opt.height, opt.width, 3)
                            .astype(np.float32))
        got = sfx.infer_exported(loaded, left, right)
        if opt.batch:
            # concrete batch: artifact and jitted model share one trace
            # (incl. Pallas-vs-XLA conv routing) → bit-identical on TPU.
            # Eager dispatch rounds differently at every op boundary and
            # an untrained soft-argmin amplifies that to pixels.
            want = jax.jit(
                lambda l, r: model.apply(variables, l, r, iters=opt.iters,
                                         train=False)["disparities"][-1]
            )(left, right)
        else:
            # symbolic batch traces take the XLA conv path (a Pallas grid
            # needs concrete dims) while a concrete-batch jit of the live
            # model routes convs to the Pallas kernel — two valid
            # programs whose ULP differences an untrained net amplifies
            # to pixels.  The meaningful property for the symbolic
            # artifact is serialization fidelity: serialize→deserialize→
            # run must reproduce the pre-serialization export bitwise.
            want = exported.call(left, right)
        err = float(jnp.abs(got - want).max())
        # recompiled-program fusion-order noise only; anything larger
        # means the artifact does not compute the model
        assert got.shape == want.shape and err < 1e-2, (got.shape, err)
        record["check_max_err_px"] = err

    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
