"""Worker process for the real multi-process distributed test.

Launched (2x) by tests/test_multiprocess.py with a loopback coordinator.
Exercises what the single-process virtual-mesh tests cannot: an actual
`jax.distributed.initialize` handshake through `init_dist` (the analog of the
reference running under torch.distributed.launch, myutils/distributed.py:16-26
+ distributed_run.sh:12), cross-process metric reduction, and a DP train step
whose gradient all-reduce spans two OS processes.

Writes a JSON verdict to <outdir>/worker<pid>.json and exits nonzero on any
assertion failure.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, nprocs, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )

    from f8net_tpu.models import get_model
    from f8net_tpu.parallel import batch_sharding, make_mesh
    from f8net_tpu.parallel.dist import (
        all_reduce_metrics,
        get_rank,
        get_world_size,
        init_dist,
        is_master,
    )
    from f8net_tpu.train import make_train_step, sgd_init
    from f8net_tpu.utils import QuantConfig
    from f8net_tpu.utils.config import TrainConfig

    coord = f"127.0.0.1:{port}"
    rank = init_dist(coord, nprocs, pid)
    assert rank == pid, (rank, pid)
    assert get_world_size() == nprocs, get_world_size()
    # second call must be a no-op (regression: the pre-fix guard fell through
    # to a second jax.distributed.initialize when count > 1 and an address
    # was passed)
    assert init_dist(coord, nprocs, pid) == pid
    assert get_rank() == pid and is_master() == (pid == 0)

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nprocs * n_local, (n_global, nprocs, n_local)

    # cross-process metric reduction (per-host scalars)
    red = all_reduce_metrics({"x": float(pid + 1)}, reduction="sum")
    assert float(red["x"]) == nprocs * (nprocs + 1) / 2, red
    red = all_reduce_metrics({"x": float(pid + 1)}, reduction="mean")
    assert abs(float(red["x"]) - (nprocs + 1) / 2) < 1e-6, red

    # ---- DP train step across processes vs single-device reference --------
    fcfg = QuantConfig(floating_model=True, floating_wo_clip=True)
    tcfg = TrainConfig(
        num_epochs=1, batch_size=8, lr=0.05, lr_scheduler="constant", topk=(1,)
    )
    model = get_model("mobilenet_v1", fcfg, num_classes=8)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = sgd_init(params)
    global_bs = 2 * n_global
    images = jax.random.uniform(jax.random.PRNGKey(1), (global_bs, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (global_bs,), 0, 8)
    w0 = np.asarray(params["head"]["w"]).copy()

    # single-device reference (local devices only; same math)
    step = make_train_step(model, fcfg, tcfg)
    p1, s1, o1, m1 = step(
        jax.tree_util.tree_map(jnp.copy, params),
        jax.tree_util.tree_map(jnp.copy, state),
        jax.tree_util.tree_map(jnp.copy, opt),
        images,
        labels,
        0.05,
    )
    loss_ref, top1_ref = float(m1["loss"]), float(m1["top1"])
    d1 = np.asarray(p1["head"]["w"]).ravel() - w0.ravel()

    # global mesh over both processes' devices; this process contributes its
    # batch shard (per-host input feeding, reference: per-rank DataLoader)
    mesh = make_mesh(data=n_global, model=1)
    repl = NamedSharding(mesh, P())
    mk = jax.make_array_from_process_local_data
    pd = jax.tree_util.tree_map(lambda a: mk(repl, np.asarray(a)), params)
    sd = jax.tree_util.tree_map(lambda a: mk(repl, np.asarray(a)), state)
    od = jax.tree_util.tree_map(lambda a: mk(repl, np.asarray(a)), opt)
    bsh = batch_sharding(mesh)
    shard = global_bs // nprocs
    xd = mk(bsh, np.asarray(images[pid * shard : (pid + 1) * shard]))
    yd = mk(bsh, np.asarray(labels[pid * shard : (pid + 1) * shard]))

    step2 = make_train_step(model, fcfg, tcfg)
    p2, s2, o2, m2 = step2(pd, sd, od, xd, yd, 0.05)

    loss2, top12 = float(m2["loss"]), float(m2["top1"])
    assert abs(loss2 - loss_ref) < 1e-4 * max(1.0, abs(loss_ref)), (loss2, loss_ref)
    assert top12 == top1_ref, (top12, top1_ref)

    # parameter update agreement (direction + magnitude; elementwise equality
    # is too strict under f32 reduction-order noise, see test_parallel.py)
    d2 = np.asarray(p2["head"]["w"]).ravel() - w0.ravel()
    cos = float(np.dot(d1, d2) / (np.linalg.norm(d1) * np.linalg.norm(d2) + 1e-12))
    assert cos > 0.999, cos
    np.testing.assert_allclose(np.linalg.norm(d1), np.linalg.norm(d2), rtol=0.02)

    with open(os.path.join(outdir, f"worker{pid}.json"), "w") as f:
        json.dump(
            {
                "rank": pid,
                "world": get_world_size(),
                "devices": n_global,
                "loss": loss2,
                "cos": cos,
            },
            f,
        )
    print(f"worker {pid}: ok (loss {loss2:.4f}, cos {cos:.6f})")


if __name__ == "__main__":
    main()
