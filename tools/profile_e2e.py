"""Split the bench per-sweep time into host vs device: times the jitted
lio_step and process_sweep in isolation with device-resident inputs."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from lio_mapping_tpu.config import LioConfig
from lio_mapping_tpu.models import estimator as EST
from lio_mapping_tpu.models.point_processor import process_sweep
from lio_mapping_tpu.ops import preintegration as PI


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = bench.build_cfg()
    rng = np.random.default_rng(0)

    state = EST.init_state(cfg)
    n_pts = 16 * 900
    xyz = rng.normal(size=(n_pts, 3)).astype(np.float32) * 5
    mask = np.ones((n_pts,), bool)

    t_feat = timeit(
        jax.jit(lambda x, m: process_sweep(x, m, cfg)),
        jnp.asarray(xyz), jnp.asarray(mask))
    print(f"process_sweep: {t_feat:.2f} ms")

    feats = jax.jit(lambda x, m: process_sweep(x, m, cfg))(
        jnp.asarray(xyz), jnp.asarray(mask))
    cap = cfg.estimator.imu.max_imu_per_frame
    samples = PI.ImuSamples(
        acc0=jnp.asarray([0.0, 0.0, 9.805], jnp.float32),
        gyr0=jnp.zeros(3, jnp.float32),
        dt=jnp.zeros(cap, jnp.float32).at[:20].set(0.005),
        acc=jnp.tile(jnp.asarray([0.0, 0.0, 9.805], jnp.float32), (cap, 1)),
        gyr=jnp.zeros((cap, 3), jnp.float32))

    step = jax.jit(lambda s, c, i: EST.lio_step(s, c, i, cfg))
    # steady-state timing on a fixed state (state evolves in real use, but
    # the program is identical)
    new_state, out = step(state, feats.surf_less_flat, samples)
    t_step = timeit(lambda: step(new_state, feats.surf_less_flat, samples), n=20)
    print(f"lio_step (jitted, device-resident inputs): {t_step:.2f} ms")
    print(f"sum: {t_feat + t_step:.2f} ms (bench: 37.3 ms/sweep)")


if __name__ == "__main__":
    main()
