#!/usr/bin/env python3
"""Randomized differential gate: the fixed sf0.01 fixture can only ever
certify the content it happens to contain, so this harness bootstraps a
RANDOM corpus from sf0.001 (resample rows with replacement — keeps every
format/shape assumption), renumbers doc/vec ids contiguously (structural
assumptions like `vec_id < nlist` centroids stay valid), INJECTS
adversarial content the fixture lacks — empty/whitespace/unicode/
punctuation-heavy/duplicate documents, a zero vector, duplicated and
denormal embeddings — and then runs the full Verify -> DuckDB compare.

Usage: python3 tools/fuzz_oracle.py [seed ...]   (default seeds: 1 2 3)

Every seed must end "N pass, 0 fail" for the full registered query set;
a mismatch is a real cross-engine divergence the fixture gate missed.
"""
import json
import os
import re
import shutil
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("GRAFT_FUZZ_SRC", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EDGE_DOCS = [
    "",                                   # empty text: zero tokens everywhere
    "   ",                                # whitespace-only: normalizes to ""
    "word",                               # single token: no bigrams/shingles
    "the the the the the",                # max repetition, all stopwords
    "a!b@c#d$e%f^g&h*",                   # punctuation-heavy, fails quality
    "héllo wörld 中文 café straße",  # unicode (BMP)
    # SUPPLEMENTARY-PLANE text (r12 verdict #6): every char below is one
    # code point but TWO UTF-16 code units — the class the code-point
    # split fix (batched/fast BPE) addressed; pinning it in EDGE_DOCS
    # means any regression to code-unit slicing breaks the next seed.
    "🚀🚀 emoji 🎉 pair 👨‍👩‍👧 zwj",      # emoji incl. a ZWJ family sequence
    "𠀀𠀁𠀂 cjk 𪛔𪛕 extb 𠀀𠀁𠀂",          # CJK extension B, repeated run
    "mix 🚀x𠀀y🎉 mash",                   # supplementary chars inside a word
    "tab\tand\nnewline  and   runs",      # whitespace runs collapse
    ("longdoc " * 300).strip(),           # 300 identical tokens
]


def java_cmd(main, *args):
    opens = ["java.base/java.lang", "java.base/java.lang.invoke",
             "java.base/java.lang.reflect", "java.base/java.io",
             "java.base/java.net", "java.base/java.nio", "java.base/java.util",
             "java.base/java.util.concurrent",
             "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
             "java.base/sun.nio.cs", "java.base/sun.security.action",
             "java.base/sun.util.calendar"]
    cmd = ["java"] + [f"--add-opens={o}=ALL-UNNAMED" for o in opens] + [
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-Xmx8g", "-cp",
        f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*", main] + list(args)
    return cmd


def gen_corpus(seed: int, out: str) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    # Primary-key contracts are part of the schema, not an accident of the
    # fixture: rank/dedup/stateful operators document a tie-broken total
    # order over these keys, so the bootstrap must not duplicate them.
    # (First fuzz run proved it: duplicated lineitem/event keys made q36's
    # pr_num and st05's cumulative sums legitimately order-ambiguous.)
    PK = {"region": ["r_regionkey"], "nation": ["n_nationkey"],
          "customer": ["c_custkey"], "supplier": ["s_suppkey"],
          "part": ["p_partkey"], "orders": ["o_orderkey"],
          "lineitem": ["l_orderkey", "l_linenumber"]}
    for t in TABLES:
        schema = pq.read_schema(f"{SRC}/{t}.parquet")
        df = pd.read_parquet(f"{SRC}/{t}.parquet")
        df = df.sample(frac=1.0, replace=True,
                       random_state=seed).reset_index(drop=True)
        if t in PK:
            if t == "lineitem":
                # keep resampled multiplicity but restore the composite
                # key: re-sequence line numbers within each order
                df["l_linenumber"] = (df.groupby("l_orderkey").cumcount()
                                      .astype("int32") + 1)
            else:
                df = df.drop_duplicates(subset=PK[t]).reset_index(drop=True)
        if t == "events":
            # renumber ids but KEEP duplicated content — unique-key
            # contract restored while dedup operators still see clones
            df["event_id"] = np.arange(len(df), dtype=np.int64)
        hostile = seed >= 100  # mass-duplication mode: giant dup groups
        if t == "documents" and hostile:
            # 40% of the corpus becomes ONE text: a single giant
            # fingerprint group / near-dup cluster — keeper determinism
            # and hot-bucket behavior under pathological duplication
            idx = rng.choice(len(df), max(1, len(df) * 2 // 5), replace=False)
            df.loc[idx, "text"] = df["text"].iloc[0]
            df.loc[idx, "n_chars"] = len(df["text"].iloc[0])
        if t == "embeddings" and hostile:
            idx = rng.choice(len(df), max(1, len(df) * 3 // 10), replace=False)
            df.loc[idx, "embedding"] = pd.Series(
                [np.array(df["embedding"].iloc[0], dtype=np.float32)] * len(idx),
                index=idx)
        if t == "documents":
            extra = pd.DataFrame({
                "doc_id": np.zeros(len(EDGE_DOCS), dtype=np.int64),
                "text": EDGE_DOCS,
                "lang": rng.choice(df["lang"].unique(), len(EDGE_DOCS)),
                "source": rng.choice(df["source"].unique(), len(EDGE_DOCS)),
                "n_chars": [len(x) for x in EDGE_DOCS],
            })
            # a planted exact-duplicate pair of a resampled doc
            dup = df.iloc[[0, 0]].copy()
            df = pd.concat([df, extra, dup], ignore_index=True)
            df = df.sample(frac=1.0, random_state=seed + 1).reset_index(drop=True)
            df["doc_id"] = np.arange(len(df), dtype=np.int64)
            df["n_chars"] = df["text"].str.len().astype("int64")
        if t == "embeddings":
            dim = len(df["embedding"].iloc[0])
            adv = [
                np.zeros(dim, dtype=np.float32),                   # zero norm
                np.array(df["embedding"].iloc[5], dtype=np.float32),  # exact dup
                -np.array(df["embedding"].iloc[6], dtype=np.float32), # antipode
                np.full(dim, 1e-30, dtype=np.float32),             # denormal
                np.full(dim, -1.0, dtype=np.float32),
            ]
            extra = pd.DataFrame({
                "vec_id": np.zeros(len(adv), dtype=np.int64),
                "embedding": adv,
                "label": rng.integers(0, 5, len(adv)).astype("int32"),
            })
            df = pd.concat([df, extra], ignore_index=True)
            df = df.sample(frac=1.0, random_state=seed + 2).reset_index(drop=True)
            df["vec_id"] = np.arange(len(df), dtype=np.int64)
        table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
        pq.write_table(table, f"{out}/{t}.parquet")


def pin_rundirs_fixtures(verify_out: str) -> None:
    """Copy Verify's per-pid RunDirs fixture trees into the fuzz run's own
    directory and rewrite the interpolated paths in oracle_sql.json.

    The Verify JVM interpolates paths under /tmp/graft_<user>-<pid> into
    the oracle SQL (i01/i02/i04/st15 fixtures etc.); after that JVM exits,
    ANY other graft JVM's RunDirs.reapStale deletes the now-dead pid's
    tree — round 13 hit 4 phantom "No files found" fails when an sbt test
    run overlapped the window between the Verify phase and the DuckDB
    compare. Pinning the fixtures here (and pointing the SQL at the
    pinned copies) makes the compare immune to concurrent graft JVMs.
    """
    osql_path = os.path.join(verify_out, "oracle_sql.json")
    with open(osql_path) as f:
        osql = f.read()
    # the RunDirs root: /tmp/graft_<user>-<pid> — the trailing -<pid> is
    # required so the fuzz corpus dir (/tmp/graft_fuzz_<seed>, no dash)
    # is never rewritten
    roots = sorted(set(re.findall(r"/tmp/graft_[^/\"']*-\d+", osql)))
    pinned = 0
    for root in roots:
        # a reap can land at ANY point here (pre-check or mid-copy) if
        # another graft JVM starts in the window; degrade to the old
        # visible per-query failure with a warning, never a harness crash
        try:
            if not os.path.isdir(root):
                raise FileNotFoundError(root)
            dst = os.path.join(verify_out, "pinned_" + os.path.basename(root))
            shutil.copytree(root, dst, dirs_exist_ok=True)
        except OSError as e:
            print(f"WARNING: could not pin RunDirs tree {root} ({e}) — "
                  "a concurrent graft JVM reaped it; the compare will "
                  "report the affected queries against the original path",
                  flush=True)
            continue
        osql = osql.replace(root, dst)
        pinned += 1
    if pinned:
        with open(osql_path, "w") as f:
            f.write(osql)
        print(f"pinned {pinned} RunDirs tree(s) into {verify_out}",
              flush=True)


def main():
    seeds = [int(a) for a in sys.argv[1:]] or [1, 2, 3]
    rc = 0
    for seed in seeds:
        corpus = f"/tmp/graft_fuzz_{seed}"
        verify_out = f"/tmp/graft_fuzz_{seed}_out"
        shutil.rmtree(corpus, ignore_errors=True)
        shutil.rmtree(verify_out, ignore_errors=True)
        gen_corpus(seed, corpus)
        print(f"== seed {seed}: corpus at {corpus}, running Verify ==",
              flush=True)
        r = subprocess.run(java_cmd("graft.Verify", corpus, verify_out),
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            print(f"seed {seed}: VERIFY CRASHED")
            rc = 1
            continue
        errs = json.load(open(f"{verify_out}/errors.json"))
        if errs:
            print(f"seed {seed}: queries threw: {errs}")
            rc = 1
        pin_rundirs_fixtures(verify_out)
        # GRAFT_FUZZ_SKIP_ORACLES: comma-separated query names to EXCLUDE
        # from the DuckDB compare (the engine side above still ran them —
        # errors.json is checked unfiltered). As of round 10 NO tier needs
        # it: the closure-family oracles (d08/d17/d18/d20/d23/d25/g07/g20)
        # now run iterative min-label propagation with pointer doubling
        # (graft.functions.ClosureSql) behind an exact-dup collapse, so
        # the sf0.1 hostile mass-duplication tier compares ALL queries
        # (seed 107 re-certified unskipped). The knob stays as a dev
        # escape hatch only.
        skip = {s.strip() for s in
                os.environ.get("GRAFT_FUZZ_SKIP_ORACLES", "").split(",")
                if s.strip()}
        skip_args = [f"--skip={','.join(sorted(skip))}"] if skip else []
        if skip:
            print(f"seed {seed}: oracle compare skips {len(skip)}: "
                  f"{', '.join(sorted(skip))}", flush=True)
        r2 = subprocess.run(
            [sys.executable, f"{REPO}/tools/check_oracle.py", verify_out,
             corpus] + skip_args, capture_output=True, text=True)
        tail = r2.stdout.strip().splitlines()
        fails = [l for l in tail if l.startswith("FAIL")]
        print("\n".join(fails + tail[-2:]), flush=True)
        if r2.returncode != 0 or fails:
            rc = 1
    sys.exit(rc)


if __name__ == "__main__":
    main()
