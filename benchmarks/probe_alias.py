import sys, time; sys.path.insert(0, "/root/repo")
t0=time.time()
import jax
import jax.numpy as jnp
print(f"import {time.time()-t0:.0f}s", flush=True)
d = jax.devices()
print(f"devices {time.time()-t0:.0f}s {d}", flush=True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

def kern(x_hbm, o_ref):
    i = pl.program_id(0)
    def body(buf, sem):
        src = jnp.where(i > 0, i - 1, 0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(src, 1)], buf, sem)
        cp.start(); cp.wait()
        buf[...] = buf[...] + 1.0
        wb = pltpu.make_async_copy(buf, o_ref.at[pl.ds(i, 1)], sem)
        wb.start(); wb.wait()
    pl.run_scoped(body, buf=pltpu.VMEM((1, 128), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA)

x = jnp.zeros((8, 128), jnp.float32)
print(f"x ready {time.time()-t0:.0f}s", flush=True)
out = pl.pallas_call(
    kern, grid=(8,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    input_output_aliases={0: 0},
    compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    interpret=False,
)(x)
print(f"called {time.time()-t0:.0f}s", flush=True)
import numpy as np; print("tpu:", np.asarray(out[:, 0]), flush=True)  # GS would give 1,2,...,8
