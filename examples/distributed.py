"""Distributed NMF over a device mesh.

Runs on whatever devices are attached; to experiment without hardware:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed.py --force-cpu

On a multi-host pod, call nmf_tpu.parallel.mesh.init_distributed() first.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force-cpu", action="store_true")
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--cols", type=int, default=2048)
    ap.add_argument("--rank", type=int, default=128)
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import nmf_tpu as nt
    from nmf_tpu.parallel import make_mesh

    mesh = make_mesh()  # 2-D ('mr', 'mc') over all devices
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    rng = np.random.RandomState(0)
    if os.environ.get("NMF_TPU_EXAMPLE_QUICK"):
        args.rows, args.cols, args.rank = 512, 256, 16
    x = rng.rand(args.rows, args.cols).astype(np.float32)
    w0 = rng.rand(args.rows, args.rank).astype(np.float32)
    h0 = rng.rand(args.rank, args.cols).astype(np.float32)

    quick = bool(os.environ.get("NMF_TPU_EXAMPLE_QUICK"))
    res = nt.solve_sharded(
        x, w0, h0,
        nt.SolveConfig(
            max_iter=20 if quick else 100, thresh=1e-4, check_every=25
        ),
        mesh=mesh,
    )
    print(
        f"{int(res.iterations)} iterations, cost {float(res.cost):.4e}; "
        f"W sharded as {res.w.sharding}"
    )

    # batched data parallelism: one problem per device
    from jax.sharding import Mesh

    n_dev = len(jax.devices())
    bmesh = Mesh(np.asarray(jax.devices()), ("batch",))
    bm, bn = (128, 64) if quick else (512, 256)
    xs = rng.rand(n_dev, bm, bn).astype(np.float32)
    ws = rng.rand(n_dev, bm, 16).astype(np.float32)
    hs = rng.rand(n_dev, 16, bn).astype(np.float32)
    bres = nt.solve_batched(
        xs, ws, hs, nt.SolveConfig(max_iter=20 if quick else 50), mesh=bmesh
    )
    print(f"batched: {n_dev} problems, costs {np.asarray(bres.cost).round(2)}")

    # distributed serving artifact: export the shard_map transform for THIS
    # mesh shape (no devices needed at export time — an AbstractMesh is
    # traced), then serve new columns on the live mesh from the one file
    import tempfile

    r, c = (int(v) for v in mesh.devices.shape)
    w_learned = np.asarray(res.w)
    with tempfile.TemporaryDirectory() as td:
        art = os.path.join(td, "mesh-model.nmfz")
        nt.save_transform(
            art, w_learned, n_block=args.cols // 2,
            config=nt.SolveConfig(max_iter=10 if quick else 40,
                                  backend="jnp"),
            platforms=(jax.devices()[0].platform,), mesh_shape=(r, c),
        )
        served = nt.load_transform(art, mesh=mesh)(x)
        print(
            f"mesh serving: {x.shape[1]} cols on the {r}x{c} mesh, "
            f"cost {served.cost:.4e}"
        )


if __name__ == "__main__":
    main()
