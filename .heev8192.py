import time, jax, jax.numpy as jnp, numpy as np
from dlaf_tpu import DistMatrix, hermitian_eigensolver
from dlaf_tpu.matrix import util as mu
from dlaf_tpu.tune import set_tune_parameters
set_tune_parameters(matmul_precision="highest")
n, nb, band = 8192, 1024, 128
a = mu.random_hermitian(n, np.float32, seed=0)
mat = DistMatrix.from_natural(jnp.asarray(a, jnp.float32), nb)
for it in range(2):
    t0 = time.perf_counter()
    lam, v = hermitian_eigensolver(mat, band_size=band)
    vn = np.asarray(v.to_natural()); lamn = np.asarray(lam)
    wall = time.perf_counter() - t0
    resid = np.linalg.norm(a @ vn - vn * lamn[None, :]) / np.linalg.norm(a)
    print(f"it{it}: HEEV n={n} wall {wall:.1f}s resid {resid:.2e}", flush=True)
