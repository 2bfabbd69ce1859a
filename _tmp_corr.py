import time
from functools import partial
import jax, jax.numpy as jnp
from jax import lax

B, n, m = 64, 1024, 8192
key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (n, m), jnp.float32)
Bs = jax.random.normal(key, (B, n), jnp.float32)

uniq=[0]
def timed(fn, arg, reps):
    uniq[0]+=1
    a = arg + jnp.asarray(uniq[0]*1e-30, arg.dtype)
    t0=time.perf_counter(); float(fn(a, reps)); return time.perf_counter()-t0
def per_rep(fn, arg, r1, r2):
    fn(arg, r1); fn(arg, r2)
    t1=min(timed(fn,arg,r1) for _ in range(3)); t2=min(timed(fn,arg,r2) for _ in range(3))
    return (t2-t1)/(r2-r1)

@partial(jax.jit, static_argnames=("reps",))
def corr(Bs, reps):
    def body(i, acc):
        s = jnp.abs((Bs + i.astype(jnp.float32)*1e-30) @ A)
        return acc + jnp.sum(s)
    return lax.fori_loop(0, reps, body, jnp.float32(0))

@partial(jax.jit, static_argnames=("reps",))
def corr_argmax(Bs, reps):
    def body(i, acc):
        s = jnp.abs((Bs + i.astype(jnp.float32)*1e-30) @ A)
        return acc + jnp.sum(jnp.argmax(s, axis=1).astype(jnp.float32))
    return lax.fori_loop(0, reps, body, jnp.float32(0))

t = per_rep(corr, Bs, 8, 2008)
print(f"corr GEMM: {t*1e6:.1f} us = {(n*m+B*n+B*m)*4/t/1e9:.1f} GB/s")
t2 = per_rep(corr_argmax, Bs, 8, 2008)
print(f"corr+argmax: {t2*1e6:.1f} us")
