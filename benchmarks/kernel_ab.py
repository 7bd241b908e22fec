import time, jax, jax.numpy as jnp
from kanvit.ops import dispatch, kan_bases as K
from kanvit.kernels import fused_basis as FB

def bench(f, *args, n=30):
    # hard D2H sync: block_until_ready can return early on tunneled
    # transports. Chaining through eager ops is also wrong (forces
    # round-trip transfers); dispatch-then-sync measures amortized
    # device throughput.
    def sync(o):
        leaf = jax.tree.leaves(o)[0]
        float(jnp.asarray(leaf).ravel()[0])
    o = f(*args); sync(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    sync(o)
    return (time.perf_counter()-t0)/n*1000

key = jax.random.PRNGKey(0)
# CIFAR fourier embedder: batch 1024 x 16 tokens, in=192, g=28, out=64
for (N, IN, G, OUT, name) in [(16384, 192, 28, 64, "fourier-embedder-cifar"),
                              (16384, 16, 28, 64, "fourier-embedder-mnist"),
                              (65536, 192, 28, 64, "fourier-embedder-cifar-4096batch")]:
    x = jax.random.normal(key, (N, IN))*0.8
    co = jax.random.normal(key, (2, OUT, IN, G))*0.05
    b = jnp.zeros(OUT)
    dispatch.set_impl("pallas")
    f_pal = jax.jit(lambda x, co: FB.fourierkan(x, co, b))
    g_pal = jax.jit(jax.grad(lambda x, co: (FB.fourierkan(x, co, b)**2).sum(), argnums=(0,1)))
    t_fp = bench(f_pal, x, co); t_gp = bench(g_pal, x, co)
    dispatch.set_impl("jnp")
    f_jnp = jax.jit(lambda x, co: K.fourierkan_forward(x, co, b))
    g_jnp = jax.jit(jax.grad(lambda x, co: (K.fourierkan_forward(x, co, b)**2).sum(), argnums=(0,1)))
    t_fj = bench(f_jnp, x, co); t_gj = bench(g_jnp, x, co)
    print(f"{name}: fwd pallas {t_fp:.2f}ms jnp {t_fj:.2f}ms | grad pallas {t_gp:.2f}ms jnp {t_gj:.2f}ms", flush=True)
dispatch.set_impl("auto")
print("AB_DONE", flush=True)
