#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name> dir under verifyOutDir: load the Spark result parquet,
run oracle_sql.json[<name>] in DuckDB against the sf tables, sort columns
by name, sort rows, and compare cell-by-cell (exact; doubles also get a
rel-tol report so near-misses are visible before the real gate runs).

Round-14 additions (the q402 adjudication, CORRECTNESS_r13):
 - PANDAS-DTYPE-KIND GATE: the driver's hasher works on pandas frames,
   where DuckDB HUGEINT and DECIMAL become float64 while Spark's BIGINT
   stays int64 — values can be cell-equal yet hash differently. Any
   column whose pandas kind (int vs float) differs between the Spark
   parquet and the oracle result is a FAIL here even when every cell
   matches. (This is exactly how q402's un-cast `//` divisor slipped
   through five local sweeps and then red-rowed the driver.)
 - DIGEST CROSS-CHECK: Verify writes digests.json (per query: canonical
   order-independent sha256 + row count of the rows as written). This
   script recomputes the digest from the parquet with the same
   canonicalization (see Verify.canonCell) and fails on drift, so the
   sidecar stays trustworthy for offline driver-red adjudication.
"""
import datetime
import json
import math
import os
import struct
import sys
import threading
from decimal import Decimal
from hashlib import sha256

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

EPOCH = datetime.datetime(1970, 1, 1)


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in idx], out


def cmp_cell(a, b):
    if a is None or b is None:
        return a is b, 0.0
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b), math.inf
        if math.isnan(fa) and math.isnan(fb):
            return True, 0.0
        d = abs(fa - fb)
        rel = d / max(abs(fa), abs(fb), 1e-300)
        return fa == fb, rel
    return a == b, 0.0 if a == b else math.inf


def pandas_kind(ducktype):
    """The dtype kind this DuckDB type becomes in a pandas frame — the
    representation the driver's hasher actually sees. HUGEINT and
    DECIMAL land as float64; integers as int64; everything else keyed
    by its own name."""
    t = str(ducktype).upper()
    if t == "HUGEINT" or t.startswith("DECIMAL"):
        return "f"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "i"
    if t in ("FLOAT", "DOUBLE"):
        return "f"
    # representational spellings that land as the same pandas dtype:
    # TIMESTAMP / TIMESTAMP WITH TIME ZONE / TIMESTAMP_NS etc. are all
    # datetime64; ENUM reads back as object like VARCHAR. Comparing the
    # raw names would false-FAIL a benign spelling difference.
    if t.startswith("TIMESTAMP"):
        return "M"
    if t.startswith("ENUM"):
        return "VARCHAR"
    return t


def canon_cell(v):
    """Mirror of graft.Verify.canonCell — MUST stay in lockstep."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # Java's doubleToLongBits canonicalizes EVERY NaN to
        # 0x7ff8000000000000; struct.pack preserves payload bits, so a
        # non-canonical NaN would digest-drift. Canonicalize here too.
        if math.isnan(v):
            return "f:7ff8000000000000"
        return "f:" + format(struct.unpack("<Q", struct.pack("<d", v))[0], "x")
    if isinstance(v, datetime.datetime):
        return "t:" + str((v.replace(tzinfo=None) - EPOCH)
                          // datetime.timedelta(microseconds=1))
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, Decimal):
        return "n:" + format(v.normalize(), "f")
    if isinstance(v, (bytes, bytearray)):
        return "x:" + v.hex()
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, str):
        return "s:" + v
    return "o:" + str(v)


def digest_rows(rows, cols):
    # sort the UTF-8 ENCODED rows, not the str rows: Python str sort is
    # code-point order while Java String sort is UTF-16 code-unit order —
    # they disagree for supplementary-plane chars vs U+E000..U+FFFF. Byte
    # order is the one ordering both sides share (Verify.digestRendered
    # sorts with Arrays.compareUnsigned over the same UTF-8 bytes).
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted("\x1f".join(canon_cell(r[i]) for i in idx)
                      .encode("utf-8") for r in rows)
    h = sha256()
    for s in rendered:
        h.update(s)
        h.update(b"\n")
    return h.hexdigest(), len(rows)


# Cross-language parity vector: DigestParitySpec computes the same digest
# in Scala via Verify.canonCell/digestRendered and pins the same constant.
# Exercises the two historical divergence classes: a supplementary-plane
# char (U+1F600) vs a private-use BMP char (U+E000) — opposite relative
# order under UTF-16 code units vs code points — and NaN (canonical form).
PARITY_ROWS = [
    ("\U0001f600 grin", 1, 1.5),
    (" private", 2, float("nan")),
    ("ascii", 3, -0.0),
    (None, 4, 2.0),
]
# "a_s" sorts first so the ROW sort is decided by the string cell — that
# is where UTF-16-vs-code-point order diverges; doubles first would mask it.
PARITY_COLS = ["a_s", "b_i", "c_d"]


def selftest():
    h, n = digest_rows(PARITY_ROWS, PARITY_COLS)
    print(f"parity digest: {h} rows={n}")
    return 0


def types_sweep(sf_dir, out_dir):
    """Exact output-type parity sweep (r14 verdict task: the convention is
    'Spark and oracle output types agree EXACTLY', not merely 'agree after
    the pandas conversion'). Compares the DuckDB-reported type of every
    result column between the Spark parquet and the oracle result; any
    difference — even a benign-in-pandas one like DOUBLE vs DECIMAL —
    is reported. Exit 0 only on zero divergences."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_div = n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gt = dict(zip(got.columns, (str(t) for t in got.types)))
            exp = con.sql(sql)
            et = dict(zip(exp.columns, (str(t) for t in exp.types)))
        except Exception as e:
            print(f"TYPES-ERR {name}: {e}")
            n_div += 1
            continue
        diffs = [(c, gt.get(c), et.get(c))
                 for c in sorted(set(gt) | set(et)) if gt.get(c) != et.get(c)]
        if diffs:
            print(f"TYPES-DIVERGE {name}: {diffs}")
            n_div += 1
        else:
            n_ok += 1
    print(f"== types sweep: {n_ok} exact / {n_div} divergent ==")
    return 1 if n_div else 0


def main(sf_dir, out_dir, timeout_s=None, timeout_ok=frozenset()):
    def connect():
        c = duckdb.connect()
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c
    con = connect()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    digests = {}
    dig_path = f"{out_dir}/digests.json"
    if os.path.exists(dig_path):
        digests = json.load(open(dig_path))
    n_pass = n_fail = n_timeout = n_timeout_unexpected = 0
    interrupt_exc = getattr(duckdb, "InterruptException", ())
    for name, sql in sorted(oracle.items()):
        # Optional per-ORACLE timeout (scale sweeps): some DuckDB mirrors
        # (recursive-CTE fixpoints, quadratic certificate joins) cost far
        # more in the oracle engine than the Spark plan does at sf>=0.1.
        # A timeout is recorded as ORACLE_TIMEOUT — an oracle-cost
        # statement, NOT a correctness failure; those queries remain
        # covered by the sf0.01 oracle plus the sf0.1 digest sidecar.
        # Classification contract (round-16, per ADVICE):
        #  - the timer callback SETS a per-query flag before interrupting,
        #    and a timeout is recorded only when that flag is set AND the
        #    raised exception is DuckDB's InterruptException — a genuine
        #    failure (missing parquet, type error, OOM) that merely took
        #    longer than timeout_s still reads FAIL, not ORACLE_TIMEOUT;
        #  - after ANY fired interrupt the connection is recreated: the
        #    interrupt can land between query completion and
        #    timer.cancel() (e.g. during the canon step) and abort the
        #    NEXT statement on a shared connection, red-rowing an
        #    innocent query;
        #  - timeouts not on the --timeout-ok allowlist count toward the
        #    failure exit code, so a newly super-linear oracle cannot
        #    silently drop out of scale-sweep coverage.
        # Spark result read OUTSIDE the oracle timer (round-16 ADVICE: the
        # timer used to span this read and fetchall too, so a slow result
        # read was misreported as "ORACLE_TIMEOUT (> Ns in DuckDB)" even
        # though the oracle SQL never ran).
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            graw = got.fetchall()
            gcols_raw, gtypes = list(got.columns), list(got.types)
            gcols, grows = canon(graw, gcols_raw)
        except KeyboardInterrupt:
            raise
        except Exception as e:
            print(f"FAIL {name}: exception reading spark result: {e}")
            n_fail += 1
            continue
        timer = None
        timed_out = threading.Event()
        if timeout_s:
            def _fire(c=con, flag=timed_out):
                flag.set()
                c.interrupt()
            timer = threading.Timer(timeout_s, _fire)
            timer.start()
        try:
            exp = con.sql(sql)
            eraw = exp.fetchall()
            # capture relation metadata BEFORE any connection replacement
            # (round-16 ADVICE: in the completion/cancel race path these
            # accessors were read off a relation bound to the interrupted
            # old connection, outside any try — an access failure there
            # aborted the whole sweep)
            ecols_raw, etypes = list(exp.columns), list(exp.types)
            ecols, erows = canon(eraw, ecols_raw)
        except KeyboardInterrupt:
            raise
        except Exception as e:
            if timer is not None:
                timer.cancel()
            if timed_out.is_set():
                con = connect()  # interrupted connections don't carry over
                if isinstance(e, interrupt_exc):
                    ok = " (allowlisted)" if name in timeout_ok else ""
                    print(f"ORACLE_TIMEOUT {name} "
                          f"(> {timeout_s:.0f}s in DuckDB){ok}")
                    n_timeout += 1
                    if name not in timeout_ok:
                        n_timeout_unexpected += 1
                    continue
                # timer fired but the exception is NOT the interrupt: a
                # real failure that happened to be slow — report it red.
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        finally:
            if timer is not None:
                timer.cancel()
        if timed_out.is_set():
            # query finished but the interrupt fired anyway (completion/
            # cancel race) — results in hand are valid (metadata captured
            # above); the CONNECTION is not. Replace it before the next
            # statement touches it.
            con = connect()
        # the driver's pandas comparator cannot hash/sort array cells
        # (q44 round-1 red row) — reject them here so the local recipe
        # never green-lights a query the real gate will fail. Checked on
        # the declared TYPES of both sides (not populated cells), so a
        # zero-row result at this sf cannot mask an array-typed column.
        arr_cols = sorted(
            {c for c, t in zip(gcols_raw, gtypes)
             if any(k in str(t).upper() for k in ("LIST", "STRUCT", "MAP", "[]"))} |
            {c for c, t in zip(ecols_raw, etypes)
             if any(k in str(t).upper() for k in ("LIST", "STRUCT", "MAP", "[]"))})
        if arr_cols:
            print(f"FAIL {name}: array-typed result columns {arr_cols} "
                  f"(driver comparator rejects; serialize with array_join)")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
            continue
        # pandas-dtype-kind gate: cell-equal but kind-different columns
        # (int64 vs float64) hash-mismatch in the driver even though the
        # exact compare below passes — q402's r13 failure mode.
        kind_bad = [
            (c, str(gt), str(et))
            for c, gt, et in ((c,
                               gtypes[gcols_raw.index(c)],
                               etypes[ecols_raw.index(c)])
                              for c in gcols)
            if pandas_kind(gt) != pandas_kind(et)]
        if kind_bad:
            print(f"FAIL {name}: pandas dtype-kind mismatch "
                  f"(spark vs oracle): {kind_bad} — the driver hashes "
                  f"pandas frames, so this red-rows even when cells match "
                  f"(HUGEINT/DECIMAL -> float64; cast the oracle to BIGINT)")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
            continue
        bad = []
        worst_rel = 0.0
        for i, (gr, er) in enumerate(zip(grows, erows)):
            for j, (gv, ev) in enumerate(zip(gr, er)):
                ok, rel = cmp_cell(gv, ev)
                worst_rel = max(worst_rel, rel if rel != math.inf else 0)
                if not ok:
                    bad.append((i, gcols[j], gv, ev, rel))
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched cells; first: "
                  f"row={bad[0][0]} col={bad[0][1]} got={bad[0][2]!r} "
                  f"exp={bad[0][3]!r} rel={bad[0][4]:.2e}")
            n_fail += 1
            continue
        # digest cross-check: recompute from the parquet with the shared
        # canonicalization and compare to Verify's sidecar.
        if name in digests:
            h, n = digest_rows(graw, gcols_raw)
            want = digests[name]
            if h != want.get("sha256") or n != want.get("rows"):
                print(f"FAIL {name}: digest drift — recomputed "
                      f"{h[:16]}…/{n} vs sidecar "
                      f"{str(want.get('sha256'))[:16]}…/{want.get('rows')} "
                      f"(canonicalization contract broken; see "
                      f"Verify.canonCell)")
                n_fail += 1
                continue
        print(f"PASS {name} ({len(grows)} rows, worst_rel={worst_rel:.1e})")
        n_pass += 1
    if n_timeout:
        extra = (f" ({n_timeout_unexpected} NOT allowlisted)"
                 if n_timeout_unexpected else " (all allowlisted)")
        print(f"== {n_pass} pass / {n_fail} fail / "
              f"{n_timeout} oracle-timeout{extra} ==")
    else:
        print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail or n_timeout_unexpected else 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    if sys.argv[1:2] == ["--types"]:
        sys.exit(types_sweep(sys.argv[2], sys.argv[3]))
    timeout = None
    timeout_ok = set()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--timeout="):
            timeout = float(a.split("=", 1)[1])
        elif a.startswith("--timeout-ok="):
            timeout_ok |= {q for q in a.split("=", 1)[1].split(",") if q}
    sys.exit(main(args[0], args[1], timeout, frozenset(timeout_ok)))
