"""Single-pair inference CLI: load a checkpoint, predict disparity for a
stereo pair, save PFM/PNG (+ optional KITTI error map against GT).

Usage:
  python -m stereoformer_tpu.cli.infer --ckpt saved/model_best \
      --left l.png --right r.png --out disp.pfm \
      [--gt gt.pfm --error-out err.png] [--net LowCNN_gru] [--iters 12]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("stereoformer_tpu infer")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--net", type=str, default="LowCNN_gru")
    p.add_argument("--left", type=str, required=True)
    p.add_argument("--right", type=str, required=True)
    p.add_argument("--out", type=str, required=True,
                   help=".pfm or 16-bit KITTI .png (×256)")
    p.add_argument("--gt", type=str, default=None)
    p.add_argument("--error-out", type=str, default=None)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--maxdisp", type=int, default=192)
    opt = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from ..data import normalize, read_disp, read_img, to_unit, write_pfm
    from ..models import get_model
    from ..ops import InputPadder
    from ..train import TrainState, restore_params
    from ..utils import disp_error_image, get_logger

    logger = get_logger()

    sample = normalize(to_unit({
        "img_left": read_img(opt.left),
        "img_right": read_img(opt.right),
    }))
    left = jnp.asarray(sample["img_left"])[None]
    right = jnp.asarray(sample["img_right"])[None]
    padder = InputPadder(left.shape, divisor=8)
    left_p, right_p = padder.pad(left, right)

    model = get_model(opt.net, max_disp=opt.maxdisp)
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1, train=False)
    )(left_p, right_p)
    tx = optax.amsgrad(1e-3)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    if opt.ckpt:
        state = restore_params(opt.ckpt, state)
        logger.info("restored %s", opt.ckpt)

    out = jax.jit(
        lambda v, l, r: model.apply(v, l, r, iters=opt.iters, train=False)[
            "disparities"
        ][-1]
    )({"params": state.params, "batch_stats": state.batch_stats},
      left_p, right_p)
    disp = np.asarray(padder.unpad(out))[0, ..., 0]

    if opt.out.lower().endswith(".pfm"):
        write_pfm(opt.out, disp.astype(np.float32))
    elif opt.out.lower().endswith(".png"):
        from PIL import Image

        Image.fromarray(
            np.clip(disp * 256.0, 0, 65535).astype(np.uint16)
        ).save(opt.out)
    else:
        np.save(opt.out, disp)
    logger.info("wrote %s (range %.2f..%.2f)", opt.out, disp.min(), disp.max())

    if opt.gt and opt.error_out:
        from PIL import Image

        gt = read_disp(opt.gt)
        err = disp_error_image(disp, gt)
        Image.fromarray(err).save(opt.error_out)
        valid = gt > 0
        epe = float(np.abs(disp - gt)[valid].mean()) if valid.any() else float("nan")
        logger.info("wrote %s (EPE %.3f)", opt.error_out, epe)
    return disp


if __name__ == "__main__":
    main()
