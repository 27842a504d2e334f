"""N vs 4N scaling harness (BASELINE.md hard gate: efficiency >= 0.8).

Sandbox proxy for two cluster sizes (driver instruction: no real cluster):
the SAME job on the SAME input at local[N] and local[4N], each in its own
spark-submit process with the engine shipped via --py-files — the launch
shape the north rule mandates. Efficiency = (T_N / T_4N) / 4.

    python bench/scaling.py [--n 8] [--sf-dir /root/testdata/sf0.1]
    LLMAP_SCALING_COPIES=16   # input amplification (default 16)

Writes BENCH/scaling-n{N}.json; BENCH/BASELINE.md is authored from the
recorded pairs plus the single-box ceiling control experiments.

Measurement design notes (hard-won; see ARCHITECTURE.md §5):
  * taskset pins each level's WHOLE process tree — without it python
    workers escape the local[N] slot limit and every level converges on
    whole-box throughput.
  * one spark-submit process per measurement — python worker pools do not
    survive across jobs with distinct UDF closures, so in-session repeat
    timings drift badly.
  * warmup + x16 amplification so steady-state compute dominates fixed
    startup (codegen, worker spawn) at the larger level.
  * map-only plan (repartition=0): in local mode a shuffle measures the
    single shared disk, not the dataflow.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:  # cwd-independent imports
    sys.path.insert(0, str(REPO))


def make_engine_zip(dst: Path) -> Path:
    zpath = dst / "engine.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted((REPO / "llmap_spark").rglob("*.py")):
            z.write(f, f.relative_to(REPO))
    return zpath


def spark_submit_bin() -> str:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    return str(Path(pyspark.__path__[0]) / "bin" / "spark-submit")


def run_level(cores: int, zip_path: Path, pages: str, out: str,
              repartition: int, copies: int) -> dict:
    # taskset pins the WHOLE process tree (JVM + python workers) to `cores`
    # physical cores — without it, python workers escape the local[N] task-
    # slot limit and both levels converge on whole-box throughput, which
    # measures nothing. Pinning is the honest sandbox proxy for N executors.
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        spark_submit_bin(), "--master", f"local[{cores}]",
        "--driver-memory", "12g",
        "--py-files", str(zip_path),
        str(REPO / "bench" / "extract_job.py"),
        pages, out, str(repartition), str(cores), str(copies),
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO))
    wall = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"spark-submit failed at local[{cores}]")
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    rec["cores"] = cores
    rec["wall_sec_incl_startup"] = round(wall, 3)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    n, n4 = args.n, 4 * args.n

    from llmap_spark.corpus import pages_path_for

    pages = pages_path_for(args.sf_dir)

    tmp = Path(tempfile.mkdtemp(prefix="llmap_scaling_"))
    zip_path = make_engine_zip(tmp)
    copies = int(os.environ.get("LLMAP_SCALING_COPIES", "16"))

    results = []
    for cores in (n, n4):
        out = str(tmp / f"out_{cores}")
        # The scaled job is MAP-ONLY (repartition=0): the pipeline's salted
        # url-hash repartition exists and is tested, but a 100 TB extraction
        # run would not shuffle raw html either — scan splits already give
        # uniform partitions. In local mode all "executors" share one JVM
        # and one disk, so a shuffle measures that shared disk, not the
        # dataflow's scalability.
        # best-of-reps: this box is a shared VM (steal time observed up to
        # 20%); the minimum elapsed is the least-interfered measurement
        reps = int(os.environ.get("LLMAP_SCALING_REPS", "2"))
        runs = [run_level(cores, zip_path, pages, out, 0, copies)
                for _ in range(reps)]
        rec = min(runs, key=lambda r: r["elapsed_sec"])
        rec["all_elapsed_sec"] = [r["elapsed_sec"] for r in runs]
        rec["pages_per_sec"] = round(rec["n_pages"] / rec["elapsed_sec"], 1)
        rec["input_mb_per_sec"] = round(rec["input_bytes"] / 1e6 / rec["elapsed_sec"], 1)
        results.append(rec)
        print(json.dumps(rec))

    t_n, t_4n = results[0]["elapsed_sec"], results[1]["elapsed_sec"]
    eff = (t_n / t_4n) / 4
    summary = {
        "sf_dir": args.sf_dir,
        "n_cores": n, "n4_cores": n4,
        "elapsed_n": t_n, "elapsed_4n": t_4n,
        "pages_per_sec_n": results[0]["pages_per_sec"],
        "pages_per_sec_4n": results[1]["pages_per_sec"],
        "input_mb_per_sec_n": results[0]["input_mb_per_sec"],
        "input_mb_per_sec_4n": results[1]["input_mb_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "gate": "PASS" if eff >= 0.8 else "FAIL",
        "n_pages": results[0]["n_pages"],
        "repartition_per_level": 0,  # map-only at every level (see comment above)
        "copies": copies,
    }
    print(json.dumps(summary))

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / f"scaling-n{n}.json").write_text(json.dumps(
        {"summary": summary, "levels": results}, indent=2))
    # BENCH/BASELINE.md is authored from all recorded pairs + the
    # single-box ceiling analysis; see that file.
    shutil.rmtree(tmp, ignore_errors=True)
    return 0 if eff >= 0.8 else 1



if __name__ == "__main__":
    sys.exit(main())
