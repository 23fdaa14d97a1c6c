"""Worker for the 2-process data-parallel test (ddp_spawn parity).

The reference actually executes 2-process DDP in its suite
(/root/reference/tests/test_train.py:65-77, strategy=ddp_spawn on CPU). The
JAX-native equivalent launched here by tests/test_multiprocess.py:
``jax.distributed.initialize`` joins the processes into one runtime, the
(data, fsdp) mesh spans both processes' CPU devices, each process loads its
own shard of the global batch (DataLoader shard_index/num_shards), and
``shard_batch`` assembles global arrays via make_array_from_process_local_data.
XLA inserts the cross-process gradient all-reduce. Prints a param checksum
the parent compares across workers — identical checksums prove the update
was globally consistent.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=1").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from flax import linen as nn  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stain2stain_tpu.data.base import DataLoader, Dataset  # noqa: E402
from stain2stain_tpu.parallel import (  # noqa: E402
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from stain2stain_tpu.parallel.distributed import maybe_initialize_distributed  # noqa: E402
from stain2stain_tpu.training.optim import Adam  # noqa: E402


class ToyPairs(Dataset):
    """Deterministic regression pairs shared by both processes."""

    def __init__(self, n=32, dim=8):
        rng = np.random.default_rng(0)
        self.x = rng.standard_normal((n, dim)).astype(np.float32)
        self.y = (self.x @ rng.standard_normal((dim, 1))).astype(np.float32)

    def __len__(self):
        return len(self.x)

    def __getitem__(self, idx):
        return self.x[idx], self.y[idx]


def main() -> None:
    assert maybe_initialize_distributed(), "distributed init did not run"
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    loader = DataLoader(
        ToyPairs(),
        batch_size=8,  # global; 4 per process
        shuffle=True,
        drop_last=True,
        num_workers=1,
        seed=0,
        shard_index=pid,
        num_shards=jax.process_count(),
    )
    mesh = create_mesh()  # spans both processes' devices
    assert mesh.devices.size == 2

    model = nn.Dense(1)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8)))
    tx = Adam(lr=1e-2)
    opt_state = tx.init(params)

    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            return jnp.mean(jnp.square(model.apply(p, x) - y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    step = jax.jit(
        train_step,
        in_shardings=(rep, rep, bsh, bsh),
        out_shardings=(rep, rep, rep),
    )

    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    epoch_means = []
    nsteps = 0
    for epoch in range(4):
        loader.set_epoch(epoch)
        losses = []
        for batch in loader:
            x, y = shard_batch(mesh, batch)
            assert x.shape[0] == 8, x.shape  # global batch assembled across hosts
            params, opt_state, loss = step(params, opt_state, x, y)
            losses.append(float(loss))
            nsteps += 1
        epoch_means.append(float(np.mean(losses)))
    checksum = float(
        sum(jnp.sum(jnp.abs(leaf)) for leaf in jax.tree_util.tree_leaves(params))
    )
    assert all(np.isfinite(epoch_means)), epoch_means
    assert epoch_means[-1] < epoch_means[0], f"loss did not decrease: {epoch_means}"
    print(
        f"MPOK pid={pid} nsteps={nsteps} loss={epoch_means[-1]:.6f} checksum={checksum:.6f}"
    )


if __name__ == "__main__":
    main()
