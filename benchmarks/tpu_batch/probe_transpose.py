"""Probe: in-kernel (Mosaic) 2-D transpose cost vs plain copy on TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

B = 256
F = 2000  # grid steps

def copy_k(x_ref, o_ref):
    o_ref[0] = x_ref[0]

def trans_k(x_ref, o_ref):
    o_ref[0] = jnp.swapaxes(x_ref[0], 0, 1)

def run(kernel, name):
    x = jnp.asarray(np.random.rand(F, B, B), jnp.float32)
    f = pl.pallas_call(
        kernel,
        grid=(F,),
        in_specs=[pl.BlockSpec((1, B, B), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, B, B), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, B, B), jnp.float32),
    )
    g = jax.jit(lambda x: f(x).reshape(-1)[0])
    float(g(x)); t0 = time.perf_counter(); float(g(x))
    dt = time.perf_counter() - t0
    gbps = F * B * B * 4 * 2 / dt / 1e9
    print(f"{name}: {dt*1e6/F:.2f} us/step, {gbps:.0f} GB/s r+w", flush=True)
    # correctness spot-check on one block — against THIS run's own input
    # (each run draws fresh data, so cross-run comparison would be noise)
    y = f(x)
    return x, y

x1, y1 = run(copy_k, "copy3d")
x2, y2 = run(trans_k, "transpose")
np.testing.assert_array_equal(np.asarray(y1[3]), np.asarray(x1[3]))
np.testing.assert_array_equal(np.asarray(y2[3]), np.asarray(x2[3]).T)
print("transpose correct", flush=True)
