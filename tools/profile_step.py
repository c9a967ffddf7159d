"""Stage-level timing of the lio_step pipeline on the attached device.

Times each major stage of the per-sweep program as a separately-jitted
function over realistic shapes (bench config), to locate the hot spots.
Approximates the fused program (XLA fuses more inside the single jit), but
directionally correct for optimization targeting.
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lio_mapping_tpu.config import LioConfig
from lio_mapping_tpu.models import estimator as E
from lio_mapping_tpu.ops import knn as KNN
from lio_mapping_tpu.ops import voxel as VX
from lio_mapping_tpu.ops import solver as SV
from lio_mapping_tpu.ops import preintegration as PI
from lio_mapping_tpu.ops import factors as FA
from lio_mapping_tpu.utils import quaternion as quat


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import bench

    cfg = bench.build_cfg()
    e = cfg.estimator
    rng = np.random.default_rng(0)

    C = e.surf_stack_cap            # 4096
    M = e.local_map_filtered_cap    # 16384
    s_opt = e.opt_window_size

    stack = jnp.asarray(rng.normal(size=(C, 3)) * 5, jnp.float32)
    smask = jnp.ones((C,), bool)
    mapc = jnp.asarray(rng.normal(size=(M, 3)) * 5, jnp.float32)
    mmask = jnp.ones((M,), bool)
    lq = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    lt = jnp.zeros((3,), jnp.float32)

    t_knn = timeit(jax.jit(lambda a, b, c, d: KNN.knn(a, b, c, d, k=5)),
                   stack, smask, mapc, mmask)
    print(f"knn 1x ({C}x{M}, k=5): {t_knn:.2f} ms")

    feat = jax.jit(lambda mx, mm, sx, sm, q, t: E._calculate_features(
        E.make_knn5(mx, mm, cfg), sx, sm, q, t, cfg))
    t_feat = timeit(feat, mapc, mmask, stack, smask, lq, lt)
    print(f"calculate_features 1x: {t_feat:.2f} ms  (x{s_opt - 1} frames = {t_feat * (s_opt - 1):.1f})")

    lodom = jax.jit(lambda mx, mm, sx, sm, q, t: E._calculate_laser_odom(
        (E.make_knn5(mx, mm, cfg),), (sx, sm), q, t, cfg))
    t_lo = timeit(lodom, mapc, mmask, stack, smask, lq, lt)
    print(f"calculate_laser_odom (<=10 GN iters): {t_lo:.2f} ms")

    # voxel downsample of the merged local map (w * C points)
    w = e.window_size
    merged = jnp.asarray(rng.normal(size=(w * C, 3)) * 5, jnp.float32)
    mergedm = jnp.ones((w * C,), bool)
    vx = jax.jit(lambda a, b: VX.voxel_downsample(a, b, e.surf_filter_size, M))
    t_vx = timeit(vx, merged, mergedm)
    print(f"voxel_downsample {w*C} -> {M}: {t_vx:.2f} ms")

    vx2 = jax.jit(lambda a, b: VX.voxel_downsample(a, b, e.surf_filter_size, C))
    t_vx2 = timeit(vx2, stack, smask)
    print(f"voxel_downsample {C} -> {C} (stack): {t_vx2:.2f} ms")

    # window solve with realistic factor counts
    S = s_opt
    qs = jnp.tile(lq, (S + 1, 1))
    ps = jnp.asarray(rng.normal(size=(S + 1, 3)), jnp.float32)
    sb = jnp.asarray(rng.normal(size=(S + 1, 9)) * 0.1, jnp.float32)
    x0 = SV.OptStates(q=qs, p=ps, sb=sb, ex_q=lq, ex_p=lt)
    imu = PI.ImuSamples.empty(64)
    imu = imu._replace(dt=imu.dt.at[:20].set(0.005),
                       acc=imu.acc.at[:, 2].set(9.805))
    noise18 = PI.noise_matrix(0.2, 0.02, 2e-4, 2e-5, jnp.float32)
    pre1 = PI.integrate(imu, jnp.zeros(3), jnp.zeros(3), noise18)
    pres = jax.tree.map(lambda a: jnp.stack([a] * S), pre1)
    planes = SV.PlaneFactors(
        point=jnp.asarray(rng.normal(size=(S, C, 3)) * 5, jnp.float32),
        coeff=jnp.asarray(rng.normal(size=(S, C, 4)) * 0.2, jnp.float32),
        mask=jnp.ones((S, C), bool))
    from lio_mapping_tpu.ops import marginalization as MG
    prior = MG.PriorState.empty(S, jnp.float32)
    g_vec = jnp.asarray([0.0, 0.0, 9.805], jnp.float32)

    solve = jax.jit(lambda x, pr, pl, pri: SV.solve_window(
        x, pr, g_vec, pl, pri, None, s=S,
        max_iterations=e.max_solver_iterations,
        cauchy_scale=e.cauchy_loss_scale,
        opt_extrinsic=jnp.asarray(False), use_marg=jnp.asarray(True)))
    t_solve = timeit(solve, x0, pres, planes, prior)
    print(f"solve_window ({e.max_solver_iterations} LM iters, {S}x{C} planes): {t_solve:.2f} ms")

    marg = jax.jit(lambda x, pr, pl, pri: SV.marginalize_pivot(
        x, jax.tree.map(lambda a: a[0], pr), g_vec, pl, pri,
        s=S, cauchy_scale=e.cauchy_loss_scale))
    t_marg = timeit(marg, x0, pres, planes, prior)
    print(f"marginalize_pivot: {t_marg:.2f} ms")

    t_pre = timeit(jax.jit(lambda s_, a, b: PI.integrate(s_, a, b, noise18)),
                   imu, jnp.zeros(3), jnp.zeros(3))
    print(f"preintegration (64 samples): {t_pre:.2f} ms")

    total = (t_feat * (S - 1) + t_lo + t_vx + t_vx2 + t_solve + t_marg + t_pre)
    print(f"sum of stages: {total:.1f} ms (bench per-sweep ~40.7 ms)")


if __name__ == "__main__":
    main()
