import time, functools
import numpy as np
import jax, jax.numpy as jnp
from cslam_tpu.sparsification.mac import MAC, _fw_subset
from cslam_tpu.utils.edges import Edge

rng = np.random.default_rng(1)
n_poses, n_cand, k = 500, 200, 10
fixed = [Edge(i, i + 1, 1.0) for i in range(n_poses - 1)]
cand = [Edge(int(rng.integers(n_poses)), int(rng.integers(n_poses)),
             float(rng.random())) for _ in range(n_cand)]
mac = MAC(fixed, cand, n_poses)

def slope(max_iters, k1=4, k2=12, reps=3):
    @functools.partial(jax.jit, static_argnames=("m",))
    def chain(m, keys):
        def step(acc, key):
            u = jax.random.uniform(key, mac._valid_d.shape) * mac._valid_d
            kth = jax.lax.top_k(u, k)[0][-1]
            w0 = (u >= kth).astype(jnp.float32)
            wr, w, _u = _fw_subset(
                mac.L_fixed, mac._e_i_d, mac._e_j_d, mac._weights_d,
                mac._valid_d, mac.node_mask, w0, jnp.float32(1e-8),
                mac._fixed_i, mac._fixed_j, mac._fixed_w, k=k,
                max_iters=max_iters, num_nodes=mac._P,
                fiedler_method=mac.fiedler_method,
                lobpcg_iters=mac.lobpcg_iters,
                lobpcg_block=mac.lobpcg_block)
            return acc + wr + w, None
        acc, _ = jax.lax.scan(step, jnp.zeros_like(mac._valid_d), keys[:m])
        return acc
    for m in (k1, k2):
        np.asarray(chain(m, jax.random.split(jax.random.PRNGKey(7), m)))
    sl = []
    for r in range(reps):
        ks1 = jax.block_until_ready(jax.random.split(jax.random.PRNGKey(2*r), k1))
        ks2 = jax.block_until_ready(jax.random.split(jax.random.PRNGKey(2*r+1), k2))
        t0 = time.perf_counter(); np.asarray(chain(k1, ks1))
        t1 = time.perf_counter(); np.asarray(chain(k2, ks2))
        t2 = time.perf_counter()
        sl.append(((t2-t1)-(t1-t0))/(k2-k1))
    sl.sort()
    print(f"max_iters={max_iters}: {sl[len(sl)//2]*1e3:.2f} ms/solve", flush=True)

for mi in (20, 10, 5, 1):
    slope(mi)
