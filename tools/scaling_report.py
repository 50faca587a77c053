"""Produce the committed scaling-efficiency artifact (SCALING_r{N}.json).

SURVEY.md section 2.2 sets a >=85% data-parallel scaling-efficiency target at
N>=2.  This host has ONE real chip, so the artifact combines what is
measurable here (the round-3 VERDICT asked for exactly this set):

  1. Data-parallel degrees 1..8 on the 8-virtual-device CPU mesh (the same
     SPMD programs that run on a pod slice — only the collective transport
     differs).  STRONG scaling (fixed global batch) is the target metric:
     the 8 virtual devices share 2 physical cores, so ideal sec/step is
     constant and any drop below 1.0 is pure SPMD partitioning + collective
     overhead.  Weak-scaling rows are recorded too but are confounded by
     core oversubscription (per-device efficiency must fall as N-fold work
     lands on fixed cores).
  2. Degree {1} on the real chip at the flagship config (the per-chip rate
     multi-chip deployments scale from).
  3. The measured per-step cost of the multi-host input path at 2 processes
     (parallel/mesh.py shape allgather + global-batch assembly), which
     rounds 2-3 flagged as unmeasured-under-load.

Usage: python tools/scaling_report.py [--out SCALING_r04.json]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_cpu_mesh(mode, steps=10, attempts=4):
    """Run the CPU-mesh sweep ``attempts`` times and min-merge sec_per_step
    per degree: this 2-core host shows multi-x background-load swings
    minutes apart (measured), and the minimum is the least-contended
    estimate of each degree's true cost."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    best = None
    for _ in range(attempts):
        r = subprocess.run(
            [sys.executable, "-m",
             "few_shot_transformer_tts_tpu.parallel.scaling",
             "--force_host_devices", "8", "--small", "--devices", "1,2,4,8",
             "--steps", str(steps), "--mode", mode],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(ln) for ln in r.stdout.splitlines()
                if ln.startswith("{")]
        if best is None:
            best = rows
        else:
            for b, n in zip(best, rows):
                if n["sec_per_step"] < b["sec_per_step"]:
                    b.update(n)
    # recompute efficiency from the merged minima
    for r in best:
        if mode == "strong":
            r["efficiency"] = best[0]["sec_per_step"] / r["sec_per_step"]
        else:
            r["efficiency"] = (r["audio_s_per_sec_per_device"]
                               / best[0]["audio_s_per_sec_per_device"])
    return best


def run_chip_degree1(steps=10):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, "-m", "few_shot_transformer_tts_tpu.parallel.scaling",
         "--devices", "1", "--per_device_batch", "16", "--t_in", "192",
         "--t_out", "448", "--steps", str(steps)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=2400)
    if r.returncode != 0:
        log("chip degree-1 run failed:", r.stderr[-800:])
        return []
    return [json.loads(ln) for ln in r.stdout.splitlines()
            if ln.startswith("{")]


def analytic_dp_model():
    """Analytic data-parallel efficiency for real multi-chip hardware.

    The only per-step communication the SPMD program emits at mesh
    {data: N, model: 1} is the gradient all-reduce (XLA inserts it from the
    sharding annotations; verified in the compiled HLO).  Ring all-reduce
    moves 2*(N-1)/N * grad_bytes per chip over ICI; XLA overlaps it with the
    remaining backward, so the unoverlapped ratio is an upper bound on the
    efficiency loss.

    Bandwidth basis (cited, was a bare constant through round 4): Google
    Cloud TPU v5e system architecture lists 1600 Gbps (= 200 GB/s) of
    aggregate inter-chip interconnect per chip over 4 ICI links in a 2D
    torus (cloud.google.com/tpu/docs/v5e; the jax-ml scaling-book's
    hardware table gives the same machine 4.5e10 B/s one-way per link).  A
    bidirectional ring all-reduce along ONE torus axis therefore has
    ~2 x 45-50 GB/s ~= 100 GB/s of per-chip algorithm bandwidth, which is
    what the headline rows assume.  Because this is the one free parameter
    in the model, a sensitivity sweep over 25-400 GB/s is emitted alongside
    so the >=85% conclusion's dependence on it is visible (SCALING_r05.json
    bandwidth_sensitivity): the overlap-adjusted efficiency holds 1.0 down
    to 50 GB/s and is 0.78 at a pessimistic 25 GB/s; the no-overlap worst
    case (a bound no real XLA schedule hits) is 0.81 at the cited 100 GB/s
    and degrades to 0.51 only at 25 GB/s x 256 chips."""
    import numpy as np
    sys.path.insert(0, REPO)
    from few_shot_transformer_tts_tpu.config import default_config
    from few_shot_transformer_tts_tpu.models import ByteToMel
    import jax

    hp = default_config()
    with jax.default_device(jax.devices("cpu")[0]):
        model = ByteToMel(hp.replace(use_pallas_attention=False))
        from __graft_entry__ import _example_batch
        batch = _example_batch(hp, b=2, t_in=16, t_out=16)
        variables = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               **batch, train=True))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree.leaves(variables["params"]))
    grad_bytes = n_params * 4  # fp32 grads/params
    step_s = 0.028             # measured flagship step (bench.py)
    bw = 100e9                 # per-axis bidirectional ICI (see docstring)
    # XLA overlaps the gradient all-reduce with the remaining backward; the
    # overlappable window is the backward pass (~2/3 of the step, from the
    # profile's fwd/bwd split).  Exposed communication is what exceeds it.
    bwd_window_s = step_s * 2 / 3

    def rows_at(bw_bps):
        rows = []
        for n in (2, 4, 8, 16, 64, 256):
            comm_s = 2 * (n - 1) / n * grad_bytes / bw_bps
            exposed_s = max(0.0, comm_s - bwd_window_s)
            rows.append({
                "chips": n,
                "allreduce_s_unoverlapped": round(comm_s, 5),
                "efficiency_worst_case_no_overlap":
                    round(step_s / (step_s + comm_s), 4),
                "efficiency_overlap_adjusted":
                    round(step_s / (step_s + exposed_s), 4),
            })
        return rows

    sensitivity = []
    for gbps in (25, 50, 100, 200, 400):
        rs = rows_at(gbps * 1e9)
        sensitivity.append({
            "allreduce_GBps": gbps,
            "min_efficiency_worst_case_no_overlap": min(
                r["efficiency_worst_case_no_overlap"] for r in rs),
            "min_efficiency_overlap_adjusted": min(
                r["efficiency_overlap_adjusted"] for r in rs),
        })
    return {"n_params": n_params, "grad_bytes": grad_bytes,
            "assumed_allreduce_GBps": bw / 1e9,
            "bandwidth_basis": "v5e ICI: 1600 Gbps/chip aggregate over 4 "
                               "links, 2D torus (cloud.google.com/tpu/docs/"
                               "v5e); one ring axis bidirectional ~= 100 "
                               "GB/s algorithm bandwidth",
            "measured_step_s": step_s,
            "backward_overlap_window_s": round(bwd_window_s, 5),
            "rows": rows_at(bw),
            "bandwidth_sensitivity": sensitivity}


def run_allgather_cost():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(REPO, "tools", "allgather_cost_worker.py")
    procs, outfiles = [], []
    for rank in range(2):
        outfile = "/tmp/allgather_cost_%d.json" % rank
        outfiles.append(outfile)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(rank), "2", str(port), outfile],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out.decode(errors="replace")[-2000:]
    return [json.load(open(f)) for f in outfiles]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r04.json"))
    ap.add_argument("--analytic-only", action="store_true",
                    help="recompute just the analytic model into an "
                         "existing artifact (skips the slow CPU/chip runs)")
    args = ap.parse_args()

    if args.analytic_only:
        out = json.load(open(args.out))
        model_rows = analytic_dp_model()
        for r in model_rows["rows"]:
            log("  chips=%-4d allreduce %.2f ms -> worst-case >= %.3f, "
                "overlap-adjusted >= %.3f"
                % (r["chips"], 1e3 * r["allreduce_s_unoverlapped"],
                   r["efficiency_worst_case_no_overlap"],
                   r["efficiency_overlap_adjusted"]))
        out["analytic_dp_model"] = model_rows
        out["meets_target_analytic"] = all(
            r["efficiency_overlap_adjusted"] >= 0.85
            for r in model_rows["rows"])
        out["worst_case_no_overlap_min"] = min(
            r["efficiency_worst_case_no_overlap"]
            for r in model_rows["rows"])
        json.dump(out, open(args.out, "w"), indent=1)
        log("updated", args.out)
        print(json.dumps({
            "meets_target_analytic": out["meets_target_analytic"],
            "worst_case_no_overlap_min": out["worst_case_no_overlap_min"]}))
        return

    log("=== CPU-mesh DP strong scaling (fixed global batch; SPMD "
        "overhead; ideal 1.0 on shared cores) ===")
    strong_rows = run_cpu_mesh("strong")
    for r in strong_rows:
        log("  devices=%d  B=%d  %.3f s/step  eff=%.2f"
            % (r["devices"], r["batch"], r["sec_per_step"], r["efficiency"]))

    log("=== CPU-mesh DP weak scaling (informational; confounded by 8 "
        "virtual devices on 2 physical cores) ===")
    cpu_rows = run_cpu_mesh("weak")
    for r in cpu_rows:
        log("  devices=%d  B=%d  %.3f s/step  eff=%.2f"
            % (r["devices"], r["batch"], r["sec_per_step"], r["efficiency"]))

    log("=== real-chip degree-1 flagship rate ===")
    chip_rows = run_chip_degree1()
    for r in chip_rows:
        log("  devices=%d  %.4f s/step  %.1f audio_s/s/chip"
            % (r["devices"], r["sec_per_step"], r["audio_s_per_sec"]))

    log("=== 2-process input-path cost (shape allgather + assembly) ===")
    ag = run_allgather_cost()
    for r in ag:
        log("  rank %d: agree_shape %.3f ms, assemble %.3f ms"
            % (r["rank"], r["agree_shape_ms"], r["assemble_batch_ms"]))

    log("=== analytic DP model (real-hardware efficiency) ===")
    model_rows = analytic_dp_model()
    for r in model_rows["rows"]:
        log("  chips=%-4d allreduce %.2f ms -> worst-case (no overlap) "
            ">= %.3f, overlap-adjusted >= %.3f"
            % (r["chips"], 1e3 * r["allreduce_s_unoverlapped"],
               r["efficiency_worst_case_no_overlap"],
               r["efficiency_overlap_adjusted"]))

    out = {
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
        "target": "DP efficiency >= 0.85 at N >= 2 (SURVEY 2.2); measured "
                  "here as strong-scaling SPMD overhead on the virtual mesh "
                  "(ideal 1.0 on shared physical cores)",
        "cpu_mesh_strong_scaling": strong_rows,
        "cpu_mesh_weak_scaling_informational": cpu_rows,
        "analytic_dp_model": model_rows,
        "meets_target_analytic": all(
            r["efficiency_overlap_adjusted"] >= 0.85
            for r in model_rows["rows"]),
        "worst_case_no_overlap_min": min(
            r["efficiency_worst_case_no_overlap"]
            for r in model_rows["rows"]),
        "chip_degree1_flagship": chip_rows,
        "two_process_input_path_ms": ag,
        "notes": [
            "One real chip on this host: the >=85% claim rests on the "
            "analytic DP model (tiny, overlappable gradient all-reduce vs "
            "a 28 ms step) plus the multi-process loss-equivalence tests "
            "proving the SPMD program's correctness.",
            "CPU-mesh strong-scaling rows (fixed global batch over 1..8 "
            "virtual devices on 2 physical cores) are recorded but BIMODAL "
            "across identical runs (8-dev sec/step observed from 0.125 to "
            "0.370 minutes apart); per-device work at this scale is "
            "microseconds, so XLA-CPU executor overhead dominates and the "
            "rows bound nothing about pod-slice behavior.",
            "Weak-scaling rows grow the work N-fold on the same 2 cores; "
            "their per-device efficiency mostly measures host-core "
            "oversubscription, kept for completeness only.",
            "The input-path costs are host-side and overlap the device step "
            "via the train loop's prefetch (train/loop.py).",
        ],
    }
    json.dump(out, open(args.out, "w"), indent=1)
    log("wrote", args.out)
    print(json.dumps({
        "meets_target_analytic": out["meets_target_analytic"],
        "worst_case_no_overlap_min": out["worst_case_no_overlap_min"],
        "min_strong_efficiency_cpu_proxy": min(r["efficiency"]
                                               for r in strong_rows)}))


if __name__ == "__main__":
    main()
