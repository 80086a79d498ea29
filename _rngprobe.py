import time, jax, numpy as np, jax.numpy as jnp, sys
from jax import lax
W = 512
REPS = 100
def devtime(tag, body, init, reps=REPS):
    f = jax.jit(lambda c: lax.fori_loop(0, reps, body, c))
    r = jax.block_until_ready(f(init))
    t0=time.time(); r = jax.block_until_ready(f(init)); t=(time.time()-t0)/reps
    print(f"{tag:46s} {t*1e3:9.4f} ms/iter", flush=True)

impl = sys.argv[1] if len(sys.argv) > 1 else "threefry2x32"
key = jax.random.key(0, impl=impl)
print("impl:", impl)
x0 = jnp.zeros((W,))

devtime("fold_in only", lambda i, c: (jax.random.fold_in(c[0], i), c[1]), (key, x0))
devtime("split(2) only", lambda i, c: (jax.random.split(c[0])[0], c[1]), (key, x0))
def nrm(i, c):
    k, x = c
    k = jax.random.fold_in(k, i)
    g = jax.random.normal(k, (W, 8, 3))
    return (k, x + g[:, 0, 0])
devtime("fold_in + normal[W,8,3]", nrm, (key, x0))
def unif(i, c):
    k, x = c
    k = jax.random.fold_in(k, i)
    u = jax.random.uniform(k, (W,))
    return (k, x + u)
devtime("fold_in + uniform[W]", unif, (key, x0))
def big(i, c):
    k, x = c
    k = jax.random.fold_in(k, i)
    g = jax.random.normal(k, (W, 64, 16, 3))
    return (k, x + g[:, 0, 0, 0])
devtime("fold_in + normal[W,64,16,3] (bulk)", big, (key, x0))
