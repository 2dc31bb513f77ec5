"""Two-cluster-size scaling evidence (sandbox substitute per BASELINE).

Packages the engine as a --py-files zip, runs tools/scaling_job.py via
``spark-submit --master local[N]`` at two parallelism levels on the
SAME input, and writes throughput + scaling efficiency to
BENCH/BASELINE.md.

eff = (T_low / T_high) * (cores_low / cores_high)  — target ≥ 0.8.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/spark_graft_bench")
PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "500000"))
# ~Common-Crawl-realistic uncompressed page size (~50 KB of body text);
# gzip compresses the synthetic repetition away, but decode/parse work
# scales with the UNCOMPRESSED bytes — which is what a real crawl pays.
PAYLOAD_REPEAT = int(os.environ.get("SPARK_GRAFT_PAYLOAD_REPEAT", "400"))


def build_zip() -> str:
    dist = os.path.join(WORK, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "engine.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "openalex_collaboration_crawler_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
        z.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    return zpath


def ensure_pages() -> str:
    pages_path = os.path.join(WORK, f"pages_{PAGES}_x{PAYLOAD_REPEAT}")
    if not os.path.isdir(pages_path):
        # Build in a SUBPROCESS: an in-process builder session leaves a
        # leaked 48g-heap py4j JVM behind for the rest of the harness
        # (spark.stop() stops the context, not the gateway JVM), and its
        # GC bursts contaminate every measured leg (observed r5: the
        # leaked JVM held ~50% CPU for 50 min and the hi-level crawl
        # spread hit 2.1x; killing it restored calm).
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from openalex_collaboration_crawler_spark.session import get_spark\n"
            "from openalex_collaboration_crawler_spark.sources.pages import build_pages\n"
            "spark = get_spark(app_name='build_pages')\n"
            "build_pages(spark, n_pages=%d, payload_repeat=%d).write.mode('overwrite').parquet(%r)\n"
            "spark.stop()\n" % (REPO, PAGES, PAYLOAD_REPEAT, pages_path)
        )
        subprocess.run([sys.executable, "-c", code], check=True, timeout=3600)
    return pages_path


def run_at(cores: int, zpath: str, pages_path: str) -> dict:
    state = os.path.join(WORK, f"scaling_state_{cores}")
    if os.path.isdir(state):
        shutil.rmtree(state)
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_PAGES"] = str(PAGES)
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cores}]",
        "--driver-memory",
        "24g",
        # hash-heavy codegen allocates hard; default G1 pause targets
        # throttle high-thread local JVMs (cluster executors each have
        # their own heap and don't hit this)
        "--driver-java-options",
        "-XX:+UseG1GC -XX:MaxGCPauseMillis=400",
        "--py-files",
        zpath,
        os.path.join(REPO, "tools", "scaling_job.py"),
        str(cores),
        pages_path,
        state,
    ]
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    wall = time.time() - t0
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"scaling job at local[{cores}] produced no JSON")
    d = json.loads(line[-1])
    d["wall_sec"] = round(wall, 2)
    return d


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def os_ceiling(lo: int, hi: int, per: int = 60_000_000) -> float:
    """Same-day OS compute ceiling: identical TOTAL pure-python work at
    lo and hi processes. This box is a shared VM — its lo→hi scaling
    moves day to day (measured 0.89 in round 1, 0.74–0.79 in round 3),
    so every engine efficiency below is also reported relative to the
    ceiling measured in the SAME session."""
    import multiprocessing as mp

    def run(workers: int, per_worker: int) -> float:
        t0 = time.time()
        with mp.Pool(workers) as p:
            p.map(_burn, [per_worker] * workers)
        return time.time() - t0

    run(hi, per // 4)  # warm the pool fork path
    t_hi = run(hi, per)
    t_lo = run(lo, per * hi // lo)
    return round((t_lo / t_hi) * (lo / hi), 3)


def main() -> None:
    # N=4 vs 4N=16: both levels sit inside the host's physical-core
    # budget with headroom, so the measurement reflects the engine's
    # scaling rather than the box's shared-cache/bandwidth ceiling —
    # which os_ceiling() measures fresh for every run.
    lo, hi = int(os.environ.get("SCALE_LO", "4")), int(os.environ.get("SCALE_HI", "16"))
    # Interleaved repeated pairs with per-level BEST (min wall): this
    # shared VM suffers intermittent co-tenant storms (minutes of
    # 10-30x kernel/steal degradation — measured round 4) that hit
    # wide runs far harder than narrow ones, so a single hi/lo sample
    # can report an arbitrary efficiency in either direction. Storm
    # noise is strictly ADDITIVE, so per-level minimum over REPS
    # interleaved pairs is a consistent estimator of the engine's own
    # wall at each width; every individual run is still archived
    # unmodified in BENCH/scaling_runs.jsonl.
    reps = int(os.environ.get("SCALE_REPS", "2"))
    zpath = build_zip()
    pages_path = ensure_pages()
    runs_path = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)

    def record(level: str, r: dict) -> dict:
        with open(runs_path, "a") as f:
            json.dump({"ts": time.time(), "level": level, **r}, f)
            f.write("\n")
        return r

    # warm-up run absorbs OS page-cache + prepared-table build
    run_at(hi, zpath, pages_path)
    runs_hi, runs_lo = [], []
    for _ in range(reps):
        runs_hi.append(record("hi", run_at(hi, zpath, pages_path)))
        runs_lo.append(record("lo", run_at(lo, zpath, pages_path)))
    # Archived headline run = best COMBINED wall per level; but the
    # efficiency estimator takes the min over runs PER PHASE: storm
    # noise is additive per phase, and a run that is best combined can
    # still be storm-taxed in one phase, biasing that phase's eff.
    r_hi = min(runs_hi, key=lambda r: r["crawl_sec"] + r["queries_sec"])
    r_lo = min(runs_lo, key=lambda r: r["crawl_sec"] + r["queries_sec"])
    crawl_lo = min(r["crawl_sec"] for r in runs_lo)
    crawl_hi = min(r["crawl_sec"] for r in runs_hi)
    q_lo = min(r["queries_sec"] for r in runs_lo)
    q_hi = min(r["queries_sec"] for r in runs_hi)

    def eff(t_lo: float, t_hi: float) -> float:
        return round((t_lo / t_hi) * (lo / hi), 3)

    crawl_eff = eff(crawl_lo, crawl_hi)
    q_eff = eff(q_lo, q_hi)
    total_lo = crawl_lo + q_lo
    total_hi = crawl_hi + q_hi
    box = os_ceiling(lo, hi)
    result = {
        "lo": r_lo,
        "hi": r_hi,
        "crawl_eff": crawl_eff,
        "queries_eff": q_eff,
        "total_eff": eff(total_lo, total_hi),
        "crawl_urls_per_sec_lo": round(r_lo["crawl_urls"] / crawl_lo, 1),
        "crawl_urls_per_sec_hi": round(r_hi["crawl_urls"] / crawl_hi, 1),
        "crawl_sec_min": {"lo": crawl_lo, "hi": crawl_hi},
        "queries_sec_min": {"lo": q_lo, "hi": q_hi},
        # same-session pure-CPU lo→hi scaling of this shared VM — the
        # hard cap on every efficiency above, measured fresh because it
        # drifts day to day (0.89 r1 → ~0.76 r3)
        "os_ceiling_eff": box,
        "crawl_eff_vs_ceiling": round(crawl_eff / box, 3),
        "queries_eff_vs_ceiling": round(q_eff / box, 3),
        # per-level spread across the interleaved reps — large spread =
        # co-tenant storms during the session; all runs archived in
        # scaling_runs.jsonl
        "reps": reps,
        "crawl_sec_hi_all": [r["crawl_sec"] for r in runs_hi],
        "crawl_sec_lo_all": [r["crawl_sec"] for r in runs_lo],
    }
    print(json.dumps(result, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_last.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
