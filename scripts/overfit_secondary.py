"""Synthetic overfit evidence for the secondary model families (VERDICT
round-1 item 7): RAFT_Stereo and CrossAttentionStereo must show loss/EPE
monotonically decreasing over >=200 steps (BENCHMARKS.md "Training
dynamics" recipe, CPU backend)."""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def run(net, steps=240, crop=(96, 192), iters=4, lr=2e-4, loss=None):
    import numpy as np
    from stereoformer_tpu.train import DisparityTrainer

    tr = DisparityTrainer(
        lr=lr, dataset="dummy", trainlist="", vallist="", datapath="",
        batch_size=4, test_batch=2, model=net, loss=loss,
        train_iters=iters, eval_iters=iters, crop_size=crop,
        mesh=None, num_workers=2,
    )
    tr.initialize()
    epochs = max(1, steps // max(1, len(tr.train_loader)))
    first = last = None
    it = 0
    for ep in range(epochs):
        loss_avg, epe_avg, it = tr.train_one_epoch(ep, 0, it)
        if ep == 0:
            first = (loss_avg, epe_avg)
        last = (loss_avg, epe_avg)
        print(f"{net} epoch {ep}: loss {loss_avg:.4f} EPE {epe_avg:.4f}",
              flush=True)
    val = tr.validate()
    print(f"{net} FINAL ({it} steps): loss {first[0]:.3f}->{last[0]:.3f} "
          f"EPE {first[1]:.3f}->{last[1]:.3f} val {val}",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "raft"):
        run("RAFT_Stereo", loss="sequence")
    if which in ("both", "cross"):
        run("CrossAttentionStereo")
