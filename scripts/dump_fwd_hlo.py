"""Dump the optimized TPU HLO of the per-tile ImprovedUNet-48 forward.

Saves the compiled module text to /tmp/fwd_hlo.txt for fusion analysis
(which ops end up as compare_select / copy — the profile's hot non-conv
classes).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from image_denoising_tpu.models import ImprovedUNet

dtype = jnp.bfloat16 if "bf16" in sys.argv[1:] else None
batch = next((int(a[len("batch"):]) for a in sys.argv[1:]
              if a.startswith("batch")), 1)
model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=dtype)
x = jnp.zeros((batch, 352, 352, 1), jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]


@jax.jit
def fwd(tiles):
    return model.apply({"params": params}, tiles)


compiled = fwd.lower(x).compile()
txt = compiled.as_text()
out = "/tmp/fwd_hlo.txt"
with open(out, "w") as f:
    f.write(txt)
ca = compiled.cost_analysis()
c = ca[0] if isinstance(ca, (list, tuple)) else ca
print("saved", out, len(txt), "bytes; flops =", c.get("flops"),
      "bytes accessed =", c.get("bytes accessed"))
