"""Worker for the 2-process data-parallel training test.

Each process owns half the rows of a deterministic global batch, crops them to
its own local padded shape (simulating the independent per-host packing of
data/feeder.py), assembles the global batch via
``parallel.mesh.assemble_global_batch`` and trains N steps on a mesh spanning
both processes.  The parent compares the per-step losses against a
single-process run over the identical global batch.

Invoked as:  python multiproc_worker.py RANK NPROC PORT OUTFILE [MESH_MODEL]
"""

import json
import os
import sys


def build_global_batch(hp, b=8, t_in=40, t_out=64, seed=0):
    """Deterministic lattice-padded global batch.  All padding is zero so a
    crop-to-local-shape + repad round-trips exactly."""
    import numpy as np
    rng = np.random.RandomState(seed)
    # input lengths peak in the first half, target lengths in the second half,
    # so both directions of the cross-host shape agreement are exercised
    il = rng.randint(t_in // 2, t_in - 7, b).astype(np.int32)
    tl = rng.randint(t_out // 2, t_out - 7, b).astype(np.int32)
    il[0], tl[-1] = t_in, t_out
    inputs = rng.randint(3, 255, (b, t_in)).astype(np.int32)
    mel = (rng.randn(b, t_out, hp.num_mels) * 2.0).astype(np.float32)
    for i in range(b):
        inputs[i, il[i]:] = 0
        mel[i, tl[i]:] = 0
    return dict(
        inputs=inputs, input_lengths=il, mel_targets=mel, target_lengths=tl,
        input_spk_ids=rng.randint(0, hp.max_num_speaker, b).astype(np.int32),
        input_language_vecs=np.eye(hp.max_num_language, dtype=np.float32)[
            rng.randint(0, hp.max_num_language, b)],
    )


def local_slice(batch, rank, n_proc):
    """This process's rows, cropped to the local padded shape (multiple of 8)
    as an independently packing host would emit them."""
    import numpy as np

    def _round8(x):
        return (int(x) + 7) // 8 * 8

    b = batch["inputs"].shape[0]
    rows = slice(rank * b // n_proc, (rank + 1) * b // n_proc)
    local = {k: np.ascontiguousarray(v[rows]) for k, v in batch.items()}
    t_in = min(_round8(local["input_lengths"].max()),
               local["inputs"].shape[1])
    t_out = min(_round8(local["target_lengths"].max()),
                local["mel_targets"].shape[1])
    local["inputs"] = local["inputs"][:, :t_in]
    local["mel_targets"] = local["mel_targets"][:, :t_out]
    return local


def run_steps(hp, mesh, state, dbatch, model, n_steps):
    import jax
    from few_shot_transformer_tts_tpu.train.loop import make_train_step

    train_step = make_train_step(model, hp, mesh=mesh, donate=True)
    rng = jax.random.key(0, impl=hp.prng_impl)
    losses = []
    for i in range(n_steps):
        state, step_losses = train_step(state, dbatch, jax.random.fold_in(rng, i))
        losses.append(float(step_losses["loss"]))
    return state, losses


def main():
    rank, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outfile = sys.argv[4]
    mesh_model = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=4").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address="localhost:%d" % port,
                               num_processes=n_proc, process_id=rank)
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from few_shot_transformer_tts_tpu.config import small_test_config
    from few_shot_transformer_tts_tpu.models.tacotron import ByteToMel
    from few_shot_transformer_tts_tpu.parallel import mesh as mesh_lib
    from few_shot_transformer_tts_tpu.train.loop import create_state, device_batch

    assert jax.device_count() == 4 * n_proc, jax.devices()
    hp = small_test_config(prng_impl="threefry2x32")
    model = ByteToMel(hp)
    mesh = mesh_lib.make_mesh(data=-1, model=mesh_model)

    global_batch = build_global_batch(hp)
    local = local_slice(device_batch(global_batch), rank, n_proc)
    dbatch = mesh_lib.assemble_global_batch(local, mesh)
    for k in ("inputs", "mel_targets"):
        assert dbatch[k].shape == global_batch[k].shape, (
            k, dbatch[k].shape, global_batch[k].shape)

    state = create_state(model, hp, jax.random.PRNGKey(0),
                         device_batch(global_batch))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    state, losses = run_steps(hp, mesh, state, dbatch, model, n_steps=3)

    param_sum = float(sum(np.abs(np.asarray(jax.device_get(l))).sum()
                          for l in jax.tree.leaves(state.params)))
    with open(outfile, "w") as f:
        json.dump({"rank": rank, "losses": losses, "param_sum": param_sum}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
