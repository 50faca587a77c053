"""Worker for the 2-process sharded-checkpoint round-trip test.

Each process builds the SAME deterministic TP-sharded train state on a
2-process x 4-device ('data','model') mesh, writes ONLY its local replica-0
shards via ``save_state_sharded`` (no single-host gather anywhere), barriers,
reloads the full state from both shard files, and verifies value equality
against its own host copy of the original.

Invoked as:  python multiproc_ckpt_worker.py RANK NPROC PORT OUTFILE CKPTDIR
"""

import json
import os
import sys


def main():
    rank, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outfile, ckpt_dir = sys.argv[4], sys.argv[5]

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=4").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address="localhost:%d" % port,
                               num_processes=n_proc, process_id=rank)
    import numpy as np
    from jax.experimental import multihost_utils

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multiproc_worker import build_global_batch
    from few_shot_transformer_tts_tpu.config import small_test_config
    from few_shot_transformer_tts_tpu.models.tacotron import ByteToMel
    from few_shot_transformer_tts_tpu.parallel import mesh as mesh_lib
    from few_shot_transformer_tts_tpu.parallel.sharding_rules import (
        state_shardings)
    from few_shot_transformer_tts_tpu.train import checkpoint as ckpt_lib
    from few_shot_transformer_tts_tpu.train.loop import (create_state,
                                                         device_batch)
    from flax import traverse_util
    import flax.serialization

    assert jax.device_count() == 4 * n_proc
    hp = small_test_config(prng_impl="threefry2x32")
    model = ByteToMel(hp)
    mesh = mesh_lib.make_mesh(data=-1, model=2)

    batch = build_global_batch(hp)
    state = create_state(model, hp, jax.random.PRNGKey(0),
                         device_batch(batch))
    host_copy = jax.device_get(state)  # identical on both ranks (same seed)
    st_shard = state_shardings(state, mesh, tensor_parallel=True)
    state = jax.device_put(state, st_shard)

    saver = ckpt_lib.AsyncCheckpointer()
    saver.save(ckpt_dir, state, 7, sharded=True)
    ok_write = saver.wait()
    multihost_utils.sync_global_devices("ckpt-written")

    def flat(s):
        return {k: np.asarray(v) for k, v in traverse_util.flatten_dict(
            flax.serialization.to_state_dict(s), sep="/").items()}

    my_file = os.path.join(ckpt_dir, "model.ckpt-7.d",
                           "shard-%d-of-%d.pkl" % (rank, n_proc))
    import pickle
    payload = pickle.load(open(my_file, "rb"))
    file_elems = sum(int(np.asarray(d).size)
                     for rec in payload["leaves"].values()
                     for _, rec_d in [(None, rec)]
                     for _, d in rec["shards"])
    total_elems = sum(int(v.size) for v in flat(host_copy).values())

    template = jax.tree.map(np.zeros_like, host_copy)
    restored = ckpt_lib.load_state(
        os.path.join(ckpt_dir, "model.ckpt-7.d"), template)
    want, got = flat(host_copy), flat(restored)
    mismatch = [k for k in want
                if want[k].shape != got[k].shape
                or not np.array_equal(want[k], got[k])]
    # step was 0 in host_copy and saved as 0; ckpt says 7 -> warning only
    with open(outfile, "w") as f:
        json.dump({"rank": rank, "ok_write": ok_write,
                   "file_elems": file_elems, "total_elems": total_elems,
                   "mismatch": mismatch[:5],
                   "roundtrip_ok": not mismatch}, f)
    multihost_utils.sync_global_devices("done")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
