"""A/B the flagship eval graph: nn/conv.py:Conv (drop-in) vs
flax.linen.Conv at every zoo site — are the lowered graphs identical?

Round-3 verdict item 1 suspected the round-3 Conv drop-in (commits
7c1b5f9/f9dd11f) of perturbing the bf16 eval path.  This dumps the
StableHLO of ``LowCNN_gru.apply(..., train=False)`` under both
implementations (location metadata stripped, then SHA-256) so the claim
"the forward is the identical lax.conv_general_dilated" is checked at
the IR level rather than argued.

usage: CONV_AB=flax|dropin python scripts/_conv_ab_hlo.py <out.txt>
CPU-only (jax_platforms=cpu forced): no TPU grant needed.
"""

import hashlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

MODE = os.environ.get("CONV_AB", "dropin")
OUT = sys.argv[1] if len(sys.argv) > 1 else f"/tmp/conv_ab_{MODE}.txt"

if MODE == "flax":
    import flax.linen as fnn

    import stereoformer_tpu.nn.conv as convmod

    class FlaxConv(fnn.Conv):
        """flax.linen.Conv accepting (and ignoring) dw_impl."""

        dw_impl: str = "auto"

    # patch BEFORE any model module import so `from ..nn.conv import Conv`
    # binds the flax implementation everywhere
    convmod.Conv = FlaxConv

from stereoformer_tpu.models import get_model  # noqa: E402

B, H, W, ITERS = 8, 576, 960, 12
model = get_model("LowCNN_gru", dtype=jnp.bfloat16, loop="unroll")
rng = np.random.RandomState(0)
left = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
right = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
variables = jax.eval_shape(
    lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1,
                            train=False), left, right)


def infer(v, l, r):
    return model.apply(v, l, r, iters=ITERS, train=False)["disparities"][-1]


txt = jax.jit(infer).lower(variables, left, right).as_text()
# strip location metadata + SSA value numbering noise: loc(...) refs and
# the #loc table vary with source positions (module/line of the Conv impl)
txt = re.sub(r"loc\([^)]*\)", "", txt)
txt = "\n".join(
    l for l in txt.splitlines() if not l.lstrip().startswith("#loc"))
with open(OUT, "w") as f:
    f.write(txt)
h = hashlib.sha256(txt.encode()).hexdigest()
n_conv = txt.count("stablehlo.convolution")
print(f"mode={MODE} sha256={h[:16]} lines={len(txt.splitlines())} "
      f"convs={n_conv} -> {OUT}")
