"""Whole-model W-sharded RAFT-Stereo inference AND training.

RAFT's dominant tensor is the [B, H/4, W/4, W/4] all-pairs correlation
pyramid (reference op models/IterativeLocalCostVolume/corr/corr.py:104-111)
— quadratic in image width, the reason very wide pairs do not fit one
chip.  This driver runs the UNMODIFIED model's stages over a W-sharded
mesh so every per-device tensor scales as W·(W/n) instead of W²:

1. **Encoders** run on clip-shifted overlap-and-discard slabs (width
   W/n + 2·margin; edge slabs shift inward so window-edge conv zero
   padding coincides with the true image boundary).  The sample-local
   group/instance norms compute GLOBAL statistics via margin-masked
   ``psum`` moments (``nn/raft/encoders.WShardCtx``: each global column
   is counted by exactly one shard), so every slab column whose
   receptive field the margin covers is bit-equal to the full-width
   forward; eval BatchNorm is a fixed per-channel affine (elementwise,
   exact under any sharding).
2. **Correlation** ring-exchanges the KEPT right-feature stripes
   (``wshard.allpairs_corr1d_wsharded``) against halo-extended left
   rows: each device holds [B, H/4, W/n/4 + 2·m4, W/4] full-w2 rows —
   the W²/n memory win — and the pyramid/lookup are w1-local on them.
3. **The GRU cascade** runs on clip-shifted, pool-phase-aligned halo
   windows (m4 = 2·m8 = 4·m16, so every stride-2 avg-pool stays on the
   global grid).  After each iteration the hidden states and the coords
   are sliced back to their exact kept columns and re-windowed by a
   ±2m neighbour ``ppermute`` (zero fill at image edges is never
   selected — clip-shift keeps windows inside the image), so margin
   pollution never accumulates across iterations.  The cross-scale
   align-corners resizes (update.py:126-128 semantics) are computed in
   GLOBAL column coordinates via a per-window interpolation matrix
   (traced offsets, static slope — one small MXU contraction).
4. The final convex upsample runs on the 1/4 window; kept output
   columns are sliced out, giving a disparity map sharded on W.

Exactness: parity-tested end-to-end against the unsharded
``RAFTStereo.apply`` on the virtual mesh
(tests/test_parallel.py::test_wsharded_raft_whole_model_parity).  The
halo budget per iteration (``halo16``) must cover the update block's
column reach at 1/16 scale: flow-head(2) + GRU convs(2) + motion(7→ via
finer scales) ⇒ 8 is sufficient (the parity test locks it); the encoder
``margin`` must cover the encoder receptive field plus the finest halo
(≥ 4·(m4 + RF4) ≈ 384 for the default encoders).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from .. import ops
from ..models.raft_stereo import RAFTStereo
from ..nn.raft.encoders import WShardCtx
from ..ops.resize import _interp_axis, _interp_matrix
from .wshard import allpairs_corr1d_wsharded


def _halo_window(x: jnp.ndarray, st, i, kept: int, m: int,
                 axis_name: str) -> jnp.ndarray:
    """Rebuild a clip-shifted window [.., kept + 2m, ..] (W axis = 2) from
    exact kept columns: one ``ppermute`` each way brings 2m neighbour
    columns (missing sources at image edges arrive as zeros and are never
    selected — the clipped ``st`` keeps edge windows inside the image).

    Requires 2m ≤ kept (single-neighbour halos)."""
    n = jax.lax.axis_size(axis_name)
    h = 2 * m
    lh = jax.lax.ppermute(
        x[:, :, kept - h:], axis_name, perm=[(j, j + 1) for j in range(n - 1)]
    )
    rh = jax.lax.ppermute(
        x[:, :, :h], axis_name, perm=[(j + 1, j) for j in range(n - 1)]
    )
    ext = jnp.concatenate([lh, x, rh], axis=2)   # global [i·kept − 2m, …+kept+2m)
    return jax.lax.dynamic_slice_in_dim(ext, st - i * kept + h, kept + h,
                                        axis=2)


def _make_shard_body(
    mesh: Mesh,
    model: RAFTStereo,
    iters: int,
    margin: int,
    halo16: int,
    axis_name: str,
    train_mode: bool,
    train_bn: bool = False,
    batch_axis: str | None = None,
):
    """The per-shard W-sharded RAFT forward, shared by the eval and the
    train drivers.  Returns ``shard(variables, left, right)`` yielding
    the final kept disparity slab [B, H, Ws, 1] (``train_mode=False``,
    test_mode semantics: only the last iteration is upsampled) or the
    list of per-iteration kept disparity slabs (``train_mode=True``,
    train semantics: mask head + convex upsample every iteration,
    per-iteration ``stop_gradient`` detach as raft_stereo.py:172).
    With ``train_bn=True`` it yields ``(preds, new_batch_stats)``.

    Norm semantics: group/instance norms have no train/eval split (their
    masked-psum moments are global-exact either way).  BatchNorm runs in
    the mode ``train_bn`` selects — ``False``: running statistics, the
    reference's ``freeze_bn`` fine-tune mode (raft_stereo.py:124-127);
    ``True``: train-mode batch statistics, computed globally via the
    margin-masked pmean in ``nn/raft/encoders._Norm`` (the reference's
    from-scratch training mode, extractor.py:203-324) with the
    running-average updates returned as ``new_batch_stats`` (identical
    psums on every shard → replicated-consistent).

    Composes with ``RAFTStereo(remat_update=True)`` (the per-iteration
    nn.remat memory knob): the global-coordinate ``interp_fn`` closure
    rides through as a checkpoint static argument — verified eval+train
    on the virtual mesh."""
    assert model.n_gru_layers == 3, "sharded driver covers the 3-level cascade"
    n = mesh.shape[axis_name]
    f = 2 ** model.downsample                       # finest feature scale
    scales = [f * (1 << lvl) for lvl in range(3)]   # (4, 8, 16)
    halos = [halo16 << (2 - lvl) for lvl in range(3)]  # (4·h, 2·h, h)
    coarsest = scales[-1]
    assert margin % coarsest == 0, (margin, coarsest)
    assert margin >= scales[0] * halos[0], (
        f"margin {margin} must cover the finest GRU halo "
        f"({scales[0]}·{halos[0]}) plus the encoder receptive field"
    )

    def shard(variables, left, right):
        B, H, W, _ = left.shape
        assert W % (n * coarsest) == 0, (W, n, coarsest)
        Ws = W // n
        i = jax.lax.axis_index(axis_name)

        # ---- encoder slabs (overlap-and-discard, clip-shifted) ----
        We = min(W, Ws + 2 * margin)
        start = jnp.clip(i * Ws - margin, 0, W - We)
        ls = jax.lax.dynamic_slice_in_dim(left, start, We, axis=2)
        rs = jax.lax.dynamic_slice_in_dim(right, start, We, axis=2)
        wctx = WShardCtx(axis_name, i * Ws - start, Ws, We,
                         batch_axis=batch_axis if train_bn else None)
        if train_bn:
            (cnet_list, fmap1, fmap2), newvars = model.apply(
                variables, ls, rs, train=True, wshard=wctx,
                method=RAFTStereo.encode, mutable=["batch_stats"],
            )
            new_bs = newvars["batch_stats"]
        else:
            cnet_list, fmap1, fmap2 = model.apply(
                variables, ls, rs, train=False, wshard=wctx,
                method=RAFTStereo.encode,
            )
        net_slab = [jnp.tanh(h) for h, _ in cnet_list]
        inp_slab = [nn.relu(c) for _, c in cnet_list]
        ctx_slab = model.apply(variables, inp_slab,
                               method=RAFTStereo.context_gates)

        # ---- per-scale window geometry ----
        # kept_s: this shard's global columns at scale s; windows extend
        # them by the per-scale halo, clip-shifted at image edges.  The
        # m4 = 2·m8 = 4·m16 ratio makes window starts scale exactly by 2
        # between adjacent levels (clip commutes with the ÷2), keeping
        # every stride-2 pool on the global pixel grid.
        def geom(lvl):
            s, m = scales[lvl], halos[lvl]
            Wg, Wk = W // s, Ws // s
            assert 2 * m <= Wk, (
                f"shard too narrow at 1/{s}: need Ws/{s} = {Wk} >= {2 * m}"
                f" (2×halo); use fewer devices or wider images"
            )
            w = Wk + 2 * m
            st = jnp.clip(i * Wk - m, 0, Wg - w)
            return s, m, Wg, Wk, w, st

        net_w, ctx_w, sts = [], [], []
        for lvl in range(3):
            s, m, Wg, Wk, w, st = geom(lvl)
            so = start // s                          # slab start at scale s
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, st - so, w, axis=2)
            net_w.append(sl(net_slab[lvl]))
            ctx_w.append(tuple(sl(c) for c in ctx_slab[lvl]))
            sts.append(st)

        # ---- correlation rows: halo'd left rows × KEPT right stripes ----
        s4, m4, Wg4, Wk4, w4, st4 = geom(0)
        so4 = start // s4
        off4 = i * Wk4 - so4                         # kept offset in slab
        f1w = jax.lax.dynamic_slice_in_dim(fmap1, st4 - so4, w4, axis=2)
        f2k = jax.lax.dynamic_slice_in_dim(fmap2, off4, Wk4, axis=2)
        corr = allpairs_corr1d_wsharded(f1w, f2k, axis_name)  # [B,H4,w4,Wg4]
        if model.dtype is not None:
            corr = corr.astype(model.dtype)
        pyramid = ops.corr_pyramid(corr, model.corr_levels)
        # eval-only, as in models/raft_stereo.py (blocked VJP costs more
        # than the flat one-hot's in training)
        corr_cache = (None if train_mode
                      else ops.corr_block_cache(pyramid, model.corr_radius))

        # ---- global-coordinate cross-scale resize ----
        # align_corners maps output col J to source J·(Wc−1)/(Wf−1) in
        # GLOBAL coordinates; window-local = slope·j + (slope·st_f − st_c)
        # — static slope, traced intercept — expressed as a small [wf, wc]
        # interpolation matrix (one MXU contraction; clamped samples fall
        # only on discarded window-edge columns).
        table = {}
        for fine, coarse in ((0, 1), (1, 2)):
            _, _, Wgc, _, wc, stc = geom(coarse)
            _, _, Wgf, _, wf, stf = geom(fine)
            table[(wc, wf)] = (stc, stf, Wgc, Wgf)

        def interp_global(x, ref):
            stc, stf, Wgc, Wgf = table[(x.shape[2], ref.shape[2])]
            y = _interp_axis(
                x, None, axis=1, M=_interp_matrix(ref.shape[1], x.shape[1],
                                                  align_corners=True))
            wc, wf = x.shape[2], ref.shape[2]
            slope = (Wgc - 1) / (Wgf - 1)
            xx = jnp.clip(slope * (stf + jnp.arange(wf, dtype=jnp.float32))
                          - stc, 0.0, wc - 1)
            lo = jnp.floor(xx)
            t = (xx - lo)[:, None]
            v = jnp.arange(wc, dtype=jnp.float32)[None, :]
            M = ((v == lo[:, None]) * (1.0 - t)
                 + (v == lo[:, None] + 1.0) * t).astype(jnp.float32)
            out = jnp.einsum("ov,bhvc->bhoc", M, y,
                             preferred_element_type=jnp.float32)
            return out.astype(x.dtype)

        # ---- the GRU cascade on halo windows ----
        H4 = H // s4
        coords0 = jnp.broadcast_to(
            (st4 + jnp.arange(w4)).astype(jnp.float32)[None, None, :],
            (B, H4, w4),
        )
        coords1 = coords0
        flow_y = jnp.zeros((B, H4, w4, 1))
        mask = None
        preds = []
        for itr in range(iters):
            # per-iteration detach, as the reference (raft_stereo.py:172)
            coords1 = jax.lax.stop_gradient(coords1)
            corr_feat = ops.corr_lookup(pyramid, coords1, model.corr_radius,
                                        cache=corr_cache)
            flow = jnp.concatenate(
                [(coords1 - coords0)[..., None], flow_y], axis=-1
            )
            net_w, mask, delta = model.apply(
                variables, net_w, ctx_w, corr_feat, flow,
                need_mask=train_mode or itr == iters - 1,
                interp_fn=interp_global,
                method=RAFTStereo.update,
            )
            coords1 = coords1 + delta[..., 0]
            koff4 = i * Wk4 - st4
            if train_mode or itr == iters - 1:
                flow_up = ops.upsample_convex(
                    (coords1 - coords0)[..., None], mask, f
                )
                preds.append(jax.lax.dynamic_slice_in_dim(
                    -flow_up, f * koff4, f * Wk4, axis=2
                ))
            if itr == iters - 1:
                break
            # re-exactify: kept columns are exact; rebuild the halo
            # windows from them (the per-iteration ppermute exchange)
            fresh = []
            for lvl in range(3):
                s, m, Wg, Wk, w, st = geom(lvl)
                koff = i * Wk - st
                kept = jax.lax.dynamic_slice_in_dim(net_w[lvl], koff, Wk,
                                                    axis=2)
                fresh.append(_halo_window(kept, st, i, Wk, m, axis_name))
            net_w = fresh
            ckept = jax.lax.dynamic_slice_in_dim(coords1, koff4, Wk4, axis=2)
            coords1 = _halo_window(ckept, st4, i, Wk4, m4, axis_name)

        if train_bn:
            return preds, new_bs
        return preds if train_mode else preds[-1]

    return shard


def make_wsharded_raft_eval(
    mesh: Mesh,
    model: RAFTStereo,
    variables,
    iters: int = 12,
    margin: int = 384,
    halo16: int = 8,
    axis_name: str = "data",
    batch_axis: str | None = None,
):
    """Build ``run(left, right) -> [B, H, W, 1]`` (sharded on W): the
    W-sharded equivalent of
    ``model.apply(variables, l, r, iters=iters, test_mode=True,
    train=False)["disparities"][-1]``.

    Inputs are replicated ([B,H,W,3] is small next to the activations —
    this avoids materialising per chip); all activations — including the
    quadratic correlation pyramid — live at W/n (+halos) per device.

    ``batch_axis``: optional second mesh axis for the production 2-D
    layout (DP × W-shard, e.g. ``make_mesh_2d(dp, n, axis_names=("data",
    "width"))`` with ``axis_name="width"``, ``batch_axis="data"``) —
    batch rows shard over it with NO extra communication (the body only
    talks over ``axis_name``: norm-stat psums are per-sample, the corr
    ring and halo ppermutes are per-row)."""
    shard = _make_shard_body(mesh, model, iters, margin, halo16, axis_name,
                             train_mode=False)
    bspec = P(batch_axis) if batch_axis is not None else P()
    run = jax.shard_map(
        shard, mesh=mesh, in_specs=(P(), bspec, bspec),
        out_specs=P(batch_axis, None, axis_name, None),
    )
    return jax.jit(lambda left, right: run(variables, left, right))


def make_wsharded_raft_train(
    mesh: Mesh,
    model: RAFTStereo,
    iters: int = 12,
    margin: int = 384,
    halo16: int = 8,
    axis_name: str = "data",
    gamma: float = 0.8,
    maxdisp: float = 192.0,
    batch_axis: str | None = None,
    train_bn: bool = False,
):
    """W-sharded RAFT-Stereo TRAINING: build
    ``fn(params, batch_stats, left, right, gt) -> (loss, grads)``
    — the sequence loss (losses/squence_loss.py:6-18 semantics: per-
    iteration mean of |pred·m − gt·m| over ALL pixels, γ-weighted) over
    the per-iteration W-sharded forward, with grads psum'd across the
    mesh so pairs too wide for one chip fine-tune at all.

    ``train_bn`` selects the BatchNorm mode (see ``_make_shard_body``):
    ``False`` (default) is the reference's ``freeze_bn`` fine-tune mode
    (running statistics); ``True`` is from-scratch training — batch
    statistics computed globally via margin-masked pmean, and the
    returned callable yields ``((loss, new_batch_stats), grads)``
    (``value_and_grad`` aux) so the caller can carry the updated
    running averages.  Loss, every grad leaf, and (for ``train_bn``)
    the updated batch_stats tree are parity-tested against the
    unsharded ``value_and_grad`` on the virtual mesh
    (tests/test_parallel.py::test_wsharded_raft_train_parity,
    ``test_wsharded_raft_train_bn_parity``).

    ``batch_axis``: optional second mesh axis (DP × W-shard, see
    ``make_wsharded_raft_eval``); batch rows and gt shard over it, the
    loss mean, the grad psum and (with ``train_bn``) the BN-moment
    pmean extend over both axes (2-D parity:
    ``test_wsharded_raft_2d_mesh``)."""
    shard = _make_shard_body(mesh, model, iters, margin, halo16, axis_name,
                             train_mode=True, train_bn=train_bn,
                             batch_axis=batch_axis)
    n = mesh.shape[axis_name]
    axes = (axis_name,) if batch_axis is None else (axis_name, batch_axis)
    dp = 1 if batch_axis is None else mesh.shape[batch_axis]

    def shard_loss(params, batch_stats, left, right, gt):
        variables = {"params": params, "batch_stats": batch_stats}
        out = shard(variables, left, right)
        preds, new_bs = out if train_bn else (out, None)
        i = jax.lax.axis_index(axis_name)
        Ws = left.shape[2] // n
        gt_k = jax.lax.dynamic_slice_in_dim(gt, i * Ws, Ws, axis=2)
        m = ((gt_k > 0.0) & (gt_k < maxdisp)).astype(gt.dtype)
        denom = float(np.prod(gt.shape)) * dp     # global pixel count
        total = 0.0
        for j, p in enumerate(preds):
            w = gamma ** (len(preds) - j - 1)
            s = jax.lax.psum(jnp.sum(jnp.abs(p * m - gt_k * m)), axes)
            total = total + w * s / denom
        if train_bn:
            return total, new_bs
        return total

    # check_vma=False: same scoped workaround as wshard.py — the
    # custom-VJP Pallas convs confuse the varying-manual-axes checker
    # under differentiation; values/grads are parity-tested instead.
    # (new_bs comes out under P() — its masked pmeans are identical on
    # every shard, so the per-device value IS the replicated value.)
    bspec = P(batch_axis) if batch_axis is not None else P()
    run = jax.shard_map(
        shard_loss, mesh=mesh, in_specs=(P(), P(), bspec, bspec, bspec),
        out_specs=(P(), P()) if train_bn else P(), check_vma=False,
    )

    def global_loss(params, batch_stats, left, right, gt):
        return run(params, batch_stats, left, right, gt)

    return jax.jit(jax.value_and_grad(global_loss, has_aux=train_bn))
