"""Batch-randomized parity tests: hundreds of seeded random inputs per
Spark job, expectations computed independently in Python (hashlib /
datetime) — the property-test layer on top of the fixed golden vectors."""

from __future__ import annotations

import base64
import hashlib
import random
import string

import pytest
from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark import PipelineConfig
from fluent_plugin_opensearch_spark.config import strftime_to_spark
from fluent_plugin_opensearch_spark.operators.genid import add_hash_id

_DIGESTS = {
    "md5": hashlib.md5,
    "sha1": hashlib.sha1,
    "sha256": hashlib.sha256,
    "sha512": hashlib.sha512,
}


def _rand_str(rng, n=12):
    return "".join(rng.choice(string.ascii_letters + string.digits + " _|.-") for _ in range(n))


@pytest.mark.parametrize("hash_type", sorted(_DIGESTS))
def test_genid_parity_random_records(spark, hash_type):
    """200 seeded random (k1,k2,k3) records, random separator per run:
    Spark _hash must equal Base64(digest(k1+sep+k2+sep+k3)) from
    hashlib, including None→'' handling."""
    rng = random.Random(42)
    sep = rng.choice(["_", "|", "-", ""])
    rows = []
    for _ in range(200):
        k1 = _rand_str(rng)
        k2 = None if rng.random() < 0.2 else _rand_str(rng)
        k3 = _rand_str(rng, 5)
        rows.append((k1, k2, k3))
    df = spark.createDataFrame(rows, "k1 string, k2 string, k3 string")
    cfg = PipelineConfig(
        genid_use_record_as_seed=True,
        genid_record_keys=("k1", "k2", "k3"),
        genid_separator=sep,
        genid_hash_type=hash_type,
    )
    got = [r["_hash"] for r in add_hash_id(df, cfg).collect()]
    for (k1, k2, k3), g in zip(rows, got):
        seed = sep.join([k1, k2 or "", k3]).encode()
        want = base64.b64encode(_DIGESTS[hash_type](seed).digest()).decode()
        assert g == want, (k1, k2, k3)


def test_strftime_translation_parity(spark):
    """Every supported strftime directive: Spark date_format(translated)
    must equal Python datetime.strftime on 50 seeded random timestamps."""
    from datetime import datetime, timedelta

    rng = random.Random(7)
    fmts = ["%Y.%m.%d", "%Y-%m-%d %H:%M:%S", "%d/%m/%y", "%H%M", "%Y%j", "logs-%Y.%m.%d"]
    base = datetime(2020, 1, 1)
    stamps = [base + timedelta(seconds=rng.randrange(0, 200_000_000)) for _ in range(50)]
    df = spark.createDataFrame([(s,) for s in stamps], "ts timestamp")
    for fmt in fmts:
        got = [
            r["x"]
            for r in df.select(F.date_format("ts", strftime_to_spark(fmt)).alias("x"))
            .collect()
        ]
        want = [s.strftime(fmt) for s in stamps]
        assert got == want, fmt


def test_strftime_rejects_unknown_directive():
    with pytest.raises(ValueError):
        strftime_to_spark("%Q")


def test_dedup_clusters_transitive(spark):
    """Connected components: a-b, b-c chain clusters {a,b,c}; isolated
    pair clusters separately; deterministic min-id labels."""
    from fluent_plugin_opensearch_spark.operators.dataset import dedup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_timestamp_precedence_random(spark):
    """150 seeded random records across the @timestamp/time_key
    presence × validity matrix; expected routing timestamp and
    parse-error flag computed independently in Python per the
    reference precedence (out_opensearch.rb:972-985)."""
    from datetime import datetime, timedelta

    from fluent_plugin_opensearch_spark.operators.timestamps import inject_timestamp

    rng = random.Random(11)
    base = datetime(2024, 1, 1)

    def iso(dt):
        return dt.strftime("%Y-%m-%dT%H:%M:%S")

    rows, want = [], []
    for _ in range(150):
        event = base + timedelta(seconds=rng.randrange(0, 10_000_000))
        at_dt = base + timedelta(seconds=rng.randrange(0, 10_000_000))
        tk_dt = base + timedelta(seconds=rng.randrange(0, 10_000_000))
        at = rng.choice([None, iso(at_dt), "garbage-at"])
        tk = rng.choice([None, iso(tk_dt), "garbage-tk", str(int(tk_dt.timestamp()))])
        rows.append((at, tk, event))
        if at is not None:
            ok = at != "garbage-at"
            want.append((iso(at_dt) if ok else iso(event), not ok))
        elif tk is not None:
            ok = tk != "garbage-tk"
            want.append((iso(tk_dt) if ok else iso(event), not ok))
        else:
            want.append((iso(event), False))

    df = spark.createDataFrame(rows, "`@timestamp` string, tk string, ts timestamp_ntz")
    out = inject_timestamp(df, PipelineConfig(logstash_format=True, time_key="tk"))
    got = [
        (r["x"], r["time_parse_error"])
        for r in out.select(
            F.date_format("_event_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("x"),
            "time_parse_error",
        ).collect()
    ]
    assert got == want


def test_placeholder_random_templates(spark):
    """40 seeded random index templates (literals, ${tag}, ${custom},
    strftime directives, %%) vs an independent Python expansion."""
    from datetime import datetime

    from fluent_plugin_opensearch_spark.operators.routing import expand_placeholders

    rng = random.Random(5)
    ts = datetime(2024, 3, 5, 10, 20, 30)
    tag, region = "app.logs", "us-east"
    df = spark.createDataFrame([(tag, region, ts)], "tag string, region string, _event_ts timestamp")

    pieces = ["idx-", "x", ".", "-", "${tag}", "${region}", "%Y", "%m", "%d", "%H", "%M", "%%"]
    for _ in range(40):
        parts = [rng.choice(pieces) for _ in range(rng.randrange(1, 7))]
        template = "".join(parts)
        want = "".join(
            tag if p == "${tag}" else region if p == "${region}" else ts.strftime(p)
            if p.startswith("%") else p
            for p in parts
        )
        got = df.select(expand_placeholders(template).alias("x")).collect()[0]["x"]
        assert got == want, template


def test_chunk_id_stable_across_partitioning(spark):
    """P7 replay claim (ADVICE r1): chunk ids derive from row content,
    so the same rows under different partition layouts produce
    identical ids."""
    from fluent_plugin_opensearch_spark.operators.transforms import inject_chunk_id

    rows = [(f"c{i % 9}", i, f"logs-2024.01.{i % 28 + 1:02d}") for i in range(300)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, _index string")

    def ids(frame):
        return {
            (r["conv_id"], r["turn_idx"]): r["chunk_id"]
            for r in inject_chunk_id(frame).collect()
        }

    a = ids(df.repartition(1))
    b = ids(df.repartition(16, "turn_idx"))
    c = ids(df.coalesce(2))
    assert a == b == c


def test_flatten_random_nested_schemas(spark):
    """Seeded random nested structs (depth ≤3) flattened by
    flatten_struct_cols must equal an independent Python dict
    flattening of the same rows."""
    from fluent_plugin_opensearch_spark.operators.transforms import flatten_struct_cols

    rng = random.Random(13)

    def rand_schema(depth):
        fields = []
        for i in range(rng.randrange(1, 4)):
            name = f"f{depth}{i}"
            if depth < 3 and rng.random() < 0.5:
                fields.append((name, rand_schema(depth + 1)))
            else:
                fields.append((name, None))  # leaf string
        return fields

    def to_ddl(fields):
        parts = []
        for name, sub in fields:
            parts.append(f"{name}: string" if sub is None else f"{name}: struct<{to_ddl(sub)}>")
        return ", ".join(parts)

    def rand_value(fields):
        return tuple(
            _rand_str(rng, 5) if sub is None else rand_value(sub) for _, sub in fields
        )

    def flat(prefix, fields, value, out):
        for (name, sub), v in zip(fields, value):
            key = f"{prefix}_{name}" if prefix else name
            if sub is None:
                out[key] = v
            else:
                flat(key, sub, v, out)
        return out

    for _ in range(5):
        schema = rand_schema(1)
        ddl = to_ddl(schema)
        row = rand_value(schema)
        df = spark.createDataFrame([row], ddl)
        got = flatten_struct_cols(df, "_").collect()[0].asDict()
        want = flat("", schema, row, {})
        assert got == want, ddl


def test_prune_markers_random_model():
    """Random-parity model test for the marker GC (CLAUDE.md invariant:
    property-test new hand-rolled logic): for random marker universes,
    pruning keeps exactly the top-K numeric suffixes per prefix and
    every non-numeric token, and is idempotent."""
    import random

    from fluent_plugin_opensearch_spark.sinks.writer import _prune_markers

    rng = random.Random(41)
    for _ in range(20):
        universe = set()
        streams = {f"stream-{rng.randrange(1000):03x}" for _ in range(rng.randrange(1, 5))}
        for s in streams:
            for _ in range(rng.randrange(0, 30)):
                universe.add(f"{s}-{rng.randrange(500)}")
        for _ in range(rng.randrange(0, 3)):
            universe.add(f"token{rng.randrange(10)}x")  # non-numeric suffix
        keep = rng.randrange(1, 12)
        got = set(_prune_markers(universe, keep))
        # independent model
        want = {m for m in universe if not m.rpartition("-")[2].isdigit() or not m.rpartition("-")[0]}
        by_prefix = {}
        for m in universe - want:
            p, _, s = m.rpartition("-")
            by_prefix.setdefault(p, []).append(int(s))
        for p, ids in by_prefix.items():
            for i in sorted(ids)[-keep:]:
                want.add(f"{p}-{i}")
        assert got == want
        assert set(_prune_markers(got, keep)) == got  # idempotent


def test_grok_compile_random_parity():
    """Random grok dictionaries: expansion must extract exactly what an
    independently-built plain regex extracts on synthesized lines."""
    import random
    import re

    from fluent_plugin_opensearch_spark.operators.parse import grok_compile

    rng = random.Random(17)
    atoms = {"A": r"[a-z]+", "B": r"\d+", "C": r"[A-Z]{2}"}
    gen = {"A": lambda: _rand_str(rng, rng.randrange(1, 6)),
           "B": lambda: str(rng.randrange(10**4)),
           "C": lambda: "".join(rng.choice("QWERTY") for _ in range(2))}
    for _ in range(25):
        names = [rng.choice("ABC") for _ in range(rng.randrange(1, 5))]
        fields = [f"f{i}" for i in range(len(names))]
        grok = " ".join(f"%{{{n}:{f}}}" for n, f in zip(names, fields))
        plain = " ".join(f"({atoms[n]})" for n in names)
        line = " ".join(gen[n]() for n in names)
        m = re.match(grok_compile(grok, atoms), line)
        w = re.match(plain, line)
        assert (m is None) == (w is None)
        if m:
            assert [m.group(f) for f in fields] == list(w.groups())


def test_mg_merge_bounds_random_streams():
    """Batched Misra-Gries (streaming/stream.py:mg_merge) must satisfy
    the textbook MG guarantees on random skewed streams chopped into
    random batch sizes: est <= true, undercount <= N/(capacity+1), no
    more than `capacity` survivors, and every key with true count
    > N/(capacity+1) retained."""
    from fluent_plugin_opensearch_spark.streaming.stream import mg_merge

    rng = random.Random(1234)
    for trial in range(50):
        capacity = rng.randint(2, 16)
        n_keys = rng.randint(capacity, 200)
        # zipf-ish skew: key i drawn with weight 1/(i+1)
        keys = [f"k{i}" for i in range(n_keys)]
        weights = [1.0 / (i + 1) for i in range(n_keys)]
        stream = rng.choices(keys, weights=weights, k=rng.randint(50, 2000))
        true = {}
        for k in stream:
            true[k] = true.get(k, 0) + 1
        d: dict = {}
        i = 0
        while i < len(stream):
            step = rng.randint(1, 200)
            chunk = stream[i : i + step]
            counts: dict = {}
            for k in chunk:
                counts[k] = counts.get(k, 0) + 1
            d = mg_merge(d, counts, capacity)
            i += step
        n = len(stream)
        err = n / (capacity + 1)
        assert len(d) <= capacity
        for k, est in d.items():
            assert 0 < est <= true[k]
            assert true[k] - est <= err, (trial, k, true[k], est, err)
        for k, t in true.items():
            if t > err:
                assert k in d, (trial, k, t, err)


def test_redact_pii_random_planted(spark):
    """Random texts with K planted PII spans per class: Spark counts
    must equal the planted K and the redacted text must contain no
    residual matches (expectations independent of the operator)."""
    import re

    from fluent_plugin_opensearch_spark.operators.curation import PII_PATTERNS, redact_pii

    rng = random.Random(77)
    words = ["alpha", "beta", "gamma", "delta", "rho", "sigma", "tau"]

    def mk_email():
        return f"{_rand_word(rng)}.{_rand_word(rng)}@{_rand_word(rng)}.{rng.choice(['com','org','io'])}"

    def mk_ip():
        return ".".join(str(rng.randint(0, 255)) for _ in range(4))

    def mk_ssn():
        return f"{rng.randint(100,999)}-{rng.randint(10,99)}-{rng.randint(1000,9999)}"

    def mk_phone():
        return f"{rng.randint(200,999)}-{rng.randint(200,999)}-{rng.randint(1000,9999)}"

    def mk_cc():
        sep = rng.choice([" ", "-", ""])
        if sep:
            return sep.join(str(rng.randint(1000, 9999)) for _ in range(4))
        return "".join(str(rng.randint(0, 9)) for _ in range(rng.randint(13, 19)))

    def mk_intl():
        # fixed 10 national digits: below the 13-digit cc floor, so an
        # intl number can never double-count as a card
        sep = rng.choice([" ", "-"])
        return f"+{rng.randint(1, 99)}{sep}" + sep.join(
            str(rng.randint(100, 999)) for _ in range(3)
        ) + f"{sep}{rng.randint(0, 9)}"

    def mk_ipv6():
        groups = [f"{rng.randint(0, 0xFFFF):x}" for _ in range(8)]
        if rng.random() < 0.5:  # ::-compressed with leading+trailing groups
            return ":".join(groups[:2]) + "::" + ":".join(groups[5:])
        return ":".join(groups)

    gens = {
        "email": mk_email, "ip": mk_ip, "ssn": mk_ssn, "phone": mk_phone,
        "cc": mk_cc, "intl_phone": mk_intl, "ipv6": mk_ipv6,
    }
    rows, expected = [], []
    for i in range(60):
        planted = {name: rng.randint(0, 3) for name in gens}
        toks = []
        for name, k in planted.items():
            toks += [gens[name]() for _ in range(k)]
        toks += [rng.choice(words) for _ in range(rng.randint(3, 12))]
        rng.shuffle(toks)
        rows.append((i, " ".join(toks)))
        expected.append(planted)
    out = {r["doc_id"]: r for r in redact_pii(spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    for i, planted in enumerate(expected):
        for name in gens:
            assert out[i][f"n_{name}"] == planted[name], (i, name, rows[i][1])
        for _, pat, _repl in PII_PATTERNS:
            assert not re.search(pat, out[i]["redacted"]), (i, pat, out[i]["redacted"])


def _rand_word(rng, n=6):
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


def test_parse_split_equals_reference_regex_random(spark):
    """parse_text's split-based field extraction must equal a reference
    Python-re parse (anchored \\Z) on adversarial random lines: valid
    lines with bracket/req/ms traps inside the message, malformed
    variants, empty messages, trailing newlines, multiline text."""
    import re

    from fluent_plugin_opensearch_spark.operators.parse import GROK_PATTERN, parse_text

    ref = re.compile(GROK_PATTERN[:-1] + r"\Z")
    rng = random.Random(4242)
    traps = ["x", "a ] b", "req=9 took=1ms", "[W] req=2 took=3ms y", "ms ms ",
             "took=", "", "m s", "]["]
    rows = []
    for i in range(400):
        kind = rng.randrange(6)
        lvl = "".join(rng.choice(string.ascii_letters + string.digits + "_") for _ in range(rng.randint(1, 6)))
        req = str(rng.randint(0, 10**9))
        dur = str(rng.randint(0, 10**6))
        msg = rng.choice(traps) + rng.choice(traps)
        if kind == 0:
            text = f"[{lvl}] req={req} took={dur}ms {msg}"        # valid
        elif kind == 1:
            text = f"[{lvl}] req={req} took={dur}ms {msg}\n"      # trailing \n: must NOT parse
        elif kind == 2:
            text = f"[{lvl}] req={req} took={dur}ms "             # empty message
        elif kind == 3:
            text = f"[{lvl}] req={req} took={dur}ms a\nb"         # embedded \n: must NOT parse
        elif kind == 4:
            text = rng.choice(traps)                               # malformed
        else:
            text = f"[{lvl}] req={req}x took={dur}ms {msg}"       # corrupt req
        rows.append((i, text))
    got = {r["i"]: r for r in parse_text(spark.createDataFrame(rows, ["i", "text"])).collect()}
    for i, text in rows:
        m = ref.match(text)
        r = got[i]
        assert r["parse_ok"] == bool(m), (i, repr(text))
        if m:
            assert r["level"] == m.group(1)
            assert r["req_id"] == m.group(2)
            assert r["duration_ms"] == int(m.group(3))
            assert r["message"] == (m.group(4) or None), (i, repr(text), r["message"])
        else:
            assert r["level"] is None and r["req_id"] is None
            assert r["duration_ms"] is None and r["message"] is None


def test_split_corpus_random_python_parity(spark):
    """Random split tables × random ids: Spark's cumulative-CASE
    assignment must equal an independent Python evaluation of the same
    md5-bucket rule (bucket = first 15 hex digits of md5(salt||id) as
    int, % 1000, against cumulative per-mille bounds in insertion
    order)."""
    from fluent_plugin_opensearch_spark.operators.curation import split_corpus

    rng = random.Random(20260817)
    for trial in range(4):
        n_splits = rng.randint(2, 5)
        cuts = sorted(rng.sample(range(1, 1000), n_splits - 1))
        pms = [b - a for a, b in zip([0] + cuts, cuts + [1000])]
        names = [f"s{trial}_{i}" for i in range(n_splits)]
        splits = dict(zip(names, pms))
        salt = f"prop#{trial}"
        ids = rng.sample(range(10**9), 300)

        def py_assign(doc_id):
            h = hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()
            bucket = int(h[:15], 16) % 1000
            cum = 0
            for name, pm in splits.items():
                cum += pm
                if bucket < cum:
                    return name
            return names[-1]

        expected = {i: py_assign(i) for i in ids}
        df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
        got = {
            r["doc_id"]: r["split"]
            for r in split_corpus(df, splits, salt=salt).collect()
        }
        assert got == expected, f"trial {trial} mismatch"


def test_search_tokenize_and_template_random_parity(spark):
    """Random punctuation-rich strings: the search tokenizer and the
    log-template normalizer (Java regex side) must match an
    independent Python `re` evaluation of the same patterns — the
    dual-dialect claim behind the bm25/log_templates oracles."""
    import re

    from fluent_plugin_opensearch_spark.operators.search import _tokens, template_expr

    rng = random.Random(424242)
    chars = string.ascii_letters + string.digits + "  \t.,:;!?/=#@-_[]()%$"
    rows = [
        (i, "".join(rng.choice(chars) for _ in range(rng.randint(0, 60))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["i", "text"])
    got = {
        r["i"]: (r["toks"], r["tmpl"])
        for r in df.select(
            "i", _tokens("text").alias("toks"), template_expr("text").alias("tmpl")
        ).collect()
    }
    for i, text in rows:
        # referee note: SQL trim() (Spark AND DuckDB) strips only
        # ASCII spaces, not tabs — mimic with strip(' '), not strip()
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower().strip(" ")) if t]
        norm = re.sub(r"\s+", " ", text.strip(" "))
        tmpl = re.sub(r"\S*\d\S*", "<*>", norm)
        assert got[i] == (toks, tmpl), f"row {i}: {text!r}"
