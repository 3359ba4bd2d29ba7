"""CLI subcommands + maintenance operators."""

import json

import pytest
from pyspark.sql import functions as F

from whisper_spark import cli, maintenance
from whisper_spark.store import WhisperStore

NOW = 1700000000


@pytest.fixture()
def store(spark, tmp_path):
    s = WhisperStore.create(
        spark, str(tmp_path / "db"), [(1, 120), (60, 60)], x_files_factor=0.0
    )
    s.update_many([(NOW - i, float(i)) for i in range(1, 40)], now=NOW, metric="m")
    return s


def run_cli(argv):
    return cli.main(argv)


def test_cli_help_all_subcommands():
    """Every subcommand parses --help (the reference CI smoke-tests each
    tool with --help, tox.ini:17-34)."""
    p = cli.build_parser()
    for action in p._subparsers._group_actions[0].choices.values():
        assert action.format_help()


def test_cli_create_estimate(capsys):
    assert run_cli(["create", "ignored", "60:1440", "--estimate"]) == 0
    out = capsys.readouterr().out
    assert "20480 bytes" in out


def test_cli_info_and_fetch(store, capsys):
    assert run_cli(["info", store.path]) == 0
    out = capsys.readouterr().out
    assert "maxRetention" in out
    assert run_cli(["info", store.path, "maxRetention"]) == 0
    assert capsys.readouterr().out.strip() == "3600"
    assert run_cli(["info", store.path, "bogus"]) == 1
    capsys.readouterr()  # drain

    assert (
        run_cli(
            ["fetch", store.path, "m", "--from", str(NOW - 2000), "--until", str(NOW), "--now", str(NOW), "--json"]
        )
        == 0
    )
    data = json.loads(capsys.readouterr().out)
    assert data["step"] == 60


def test_cli_set_and_diff(spark, store, tmp_path, capsys):
    assert run_cli(["set-xfilesfactor", store.path, "0.25"]) == 0
    assert WhisperStore.open(spark, store.path).x_files_factor == pytest.approx(0.25)
    other = WhisperStore.create(
        spark, str(tmp_path / "db2"), [(1, 120), (60, 60)], x_files_factor=0.0
    )
    other.update_many([(NOW - 5, 42.0)], now=NOW, metric="m")
    assert run_cli(["diff", store.path, other.path, "--summary", "--until", str(NOW), "--now", str(NOW)]) == 0
    assert "archive 0" in capsys.readouterr().out


def test_find_corrupt(spark, tmp_path, capsys):
    good = WhisperStore.create(spark, str(tmp_path / "fleet" / "good"), [(1, 60), (60, 60)])
    bad_dir = tmp_path / "fleet" / "bad"
    bad_dir.mkdir(parents=True)
    (bad_dir / "policy.json").write_text("{ not json")
    bad = maintenance.find_corrupt(spark, str(tmp_path / "fleet"))
    assert len(bad) == 1 and bad[0][0].endswith("bad")
    assert good.path not in [b[0] for b in bad]


def test_reconcile_policies(spark, tmp_path):
    s = WhisperStore.create(
        spark, str(tmp_path / "fleet2" / "servers_cpu"),
        [(60, 120)], x_files_factor=0.5, aggregation_method="average",
    )
    s.update_many([(NOW - 60 * i, float(i)) for i in range(100)], now=NOW, metric="cpu")
    rules = [
        maintenance.PolicyRule(
            pattern="*servers_cpu*",
            archives="1m:4h,5m:1d",
            x_files_factor=0.1,
            aggregation_method="max",
        )
    ]
    rep = maintenance.reconcile_policies(
        spark, str(tmp_path / "fleet2"), rules, apply=False
    )
    assert len(rep) == 1 and len(rep[0]["drift"]) == 3 and not rep[0]["fixed"]

    rep2 = maintenance.reconcile_policies(
        spark, str(tmp_path / "fleet2"), rules, apply=True, now=NOW
    )
    assert rep2[0]["fixed"]
    s2 = WhisperStore.open(spark, s.path)
    assert s2.aggregation_method == "max"
    assert [(a.seconds_per_point, a.points) for a in s2.archives] == [(60, 240), (300, 288)]
    # no more drift
    assert maintenance.reconcile_policies(spark, str(tmp_path / "fleet2"), rules) == []


def test_auto_update(spark, store):
    """The UDF surface: column-expression read-modify-write
    (reference: contrib/whisper-auto-update.py:17-20)."""
    before = store.fetch_series("m", from_time=NOW - 119, now=NOW)
    # explicit range, like the reference tool's required from/to args —
    # the range drives archive selection for both the read and the write
    maintenance.auto_update(store, lambda ts, v: v * 2, from_time=NOW - 119, now=NOW)
    after = store.fetch_series("m", from_time=NOW - 119, now=NOW)
    for b, a in zip(before[1], after[1]):
        if b is not None:
            assert a == pytest.approx(b * 2)


def test_integrity_report(spark, store):
    store.update("m", 99.0, NOW - 5, now=NOW)  # create write amplification
    rep = {r["resolution"]: r for r in maintenance.integrity_report(store).collect()}
    assert rep[1]["rows_raw"] > rep[1]["rows_live"]
    assert rep[1]["n_metrics"] == 1


def test_cli_compact(store, capsys):
    """compact via CLI: duplicates collapse physically, fetch unchanged."""
    before = run_cli(["fetch", store.path, "m", "--from",
                      str(NOW - 300), "--until", str(NOW), "--now", str(NOW),
                      "--json"])
    assert before == 0
    out_before = capsys.readouterr().out
    assert run_cli(["compact", store.path, "--now", str(NOW)]) == 0
    capsys.readouterr()
    assert run_cli(["fetch", store.path, "m", "--from",
                    str(NOW - 300), "--until", str(NOW), "--now", str(NOW),
                    "--json"]) == 0
    assert capsys.readouterr().out == out_before


def test_vacuum_removes_only_wholly_expired_buckets(spark, tmp_path, capsys):
    """vacuum deletes (resolution, tb) dirs whose whole span is past
    retention, keeps partially-live buckets, and leaves every fetchable
    timeline bit-identical — directory metadata ops, no data rewrite."""
    import os

    from whisper_spark.store import WhisperStore, TB_SLOTS

    s = WhisperStore.create(spark, str(tmp_path / "vdb"), [(1, 120), (60, 1440)])
    span1 = 1 * TB_SLOTS  # archive-0 bucket width in seconds
    # live points now, plus points so old their archive-1 buckets expire
    s.update_many([(NOW - i, float(i)) for i in range(1, 40)], now=NOW, metric="m")
    old = NOW - 1440 * 60 - 3 * 60 * TB_SLOTS  # far past the 60s retention
    s.update_many([(old - i * 60, 1.0) for i in range(5)], now=old, metric="m")

    def dirs():
        out = []
        root = os.path.join(str(tmp_path / "vdb"), "points")
        for r in sorted(os.listdir(root)):
            if r.startswith("resolution="):
                out += [
                    (r, t)
                    for t in sorted(os.listdir(os.path.join(root, r)))
                    if t.startswith("tb=")
                ]
        return out

    before_dirs = dirs()
    (_, df) = s.fetch("m", from_time=NOW - 100, until_time=NOW, now=NOW)
    before_fetch = [tuple(r) for r in df.orderBy("ts").collect()]

    removed = s.vacuum(now=NOW)
    assert removed >= 1
    after_dirs = dirs()
    assert len(after_dirs) == len(before_dirs) - removed
    # the live archive-0 bucket(s) survive
    live_tb = (NOW - 39) // span1
    assert any(t == f"tb={live_tb}" or t == f"tb={NOW // span1}" for _, t in after_dirs)

    (_, df2) = s.fetch("m", from_time=NOW - 100, until_time=NOW, now=NOW)
    assert [tuple(r) for r in df2.orderBy("ts").collect()] == before_fetch

    # idempotent + CLI surface
    assert s.vacuum(now=NOW) == 0
    assert run_cli(["vacuum", str(tmp_path / "vdb"), "--now", str(NOW)]) == 0
    assert "0 expired" in capsys.readouterr().out


def test_cli_auto_update_expr(spark, store, capsys):
    """auto-update via CLI: a SQL expression over (ts, value) rewrites
    the stored values; fetch reflects the rewrite."""
    (_, before) = store.fetch("m", from_time=NOW - 10, until_time=NOW, now=NOW)
    vals_before = {r.ts: r.value for r in before.collect() if r.value is not None}
    assert vals_before
    assert run_cli(["auto-update", store.path, "--expr", "value * 2 + 1",
                    "--from", str(NOW - 119), "--now", str(NOW)]) == 0
    capsys.readouterr()
    (_, after) = store.fetch("m", from_time=NOW - 10, until_time=NOW, now=NOW)
    vals_after = {r.ts: r.value for r in after.collect() if r.value is not None}
    assert vals_after == {t: v * 2 + 1 for t, v in vals_before.items()}


def test_cli_find_namespace_browse(spark, tmp_path, capsys):
    """graphite /metrics/find semantics: node expansion at the pattern
    depth with leaf/branch flags (a name can be both)."""
    import json as _json

    from whisper_spark import cli
    from whisper_spark.store import WhisperStore

    now = 1700000000
    s = WhisperStore.create(spark, str(tmp_path / "db"), [(60, 60)])
    for m in ["srv.web1.cpu", "srv.web1.mem", "srv.web2.cpu",
              "srv.web1", "db.pg.conn"]:
        s.update_many([(now - 60, 1.0)], now=now, metric=m)

    assert cli.main(["find", s.path, "*", "--json"]) == 0
    top = {r["node"]: r for r in _json.loads(capsys.readouterr().out)}
    assert set(top) == {"srv", "db"}
    assert top["srv"]["is_branch"] and not top["srv"]["is_leaf"]

    assert cli.main(["find", s.path, "srv.*", "--json"]) == 0
    mid = {r["node"]: r for r in _json.loads(capsys.readouterr().out)}
    # srv.web1 is BOTH a stored metric (leaf) and a prefix (branch)
    assert mid["srv.web1"]["is_leaf"] and mid["srv.web1"]["is_branch"]
    assert mid["srv.web2"]["is_branch"] and not mid["srv.web2"]["is_leaf"]

    assert cli.main(["find", s.path, "srv.web*.cpu", "--json"]) == 0
    leaves = {r["node"]: r for r in _json.loads(capsys.readouterr().out)}
    assert set(leaves) == {"srv.web1.cpu", "srv.web2.cpu"}
    assert all(r["is_leaf"] and not r["is_branch"] for r in leaves.values())


def test_cli_tags_lists_keys_and_values(spark, tmp_path, capsys):
    import json as _json

    from whisper_spark import cli
    from whisper_spark.store import WhisperStore

    now = 1700000000
    s = WhisperStore.create(spark, str(tmp_path / "db"), [(60, 60)])
    for m in ["disk;dc=east;host=w1", "disk;dc=west;host=w2",
              "cpu;dc=east;host=w1", "plain.metric"]:
        s.update_many([(now - 60, 1.0)], now=now, metric=m)

    assert cli.main(["tags", s.path, "--json"]) == 0
    keys = {r["tag"]: r["n_values"] for r in _json.loads(capsys.readouterr().out)}
    assert keys == {"dc": 2, "host": 2}

    assert cli.main(["tags", s.path, "--tag", "dc", "--json"]) == 0
    vals = {r["value"]: r["count"] for r in _json.loads(capsys.readouterr().out)}
    assert vals == {"east": 2, "west": 1}


def test_consistent_hash_ring_minimal_movement(spark):
    """The property that makes the carbon ring worth using: removing one
    node relocates ONLY that node's metrics; everything else stays put.
    Plus: assignment is a pure projection (no join/exchange in the
    plan)."""
    from whisper_spark.maintenance import shard_assignments

    metrics = spark.range(300).select(
        F.concat(F.lit("srv."), F.col("id"), F.lit(".cpu")).alias("metric")
    )
    four = {
        r["metric"]: r["shard"]
        for r in shard_assignments(
            metrics, ["n1", "n2", "n3", "n4"]
        ).collect()
    }
    three = {
        r["metric"]: r["shard"]
        for r in shard_assignments(metrics, ["n1", "n2", "n3"]).collect()
    }
    assert set(four.values()) == {"n1", "n2", "n3", "n4"}
    moved = {m for m in four if four[m] != three[m]}
    assert moved == {m for m in four if four[m] == "n4"}

    plan = (
        shard_assignments(metrics, ["n1", "n2"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan


def test_store_sql_views(spark, tmp_path):
    """create_views exposes the store to plain spark.sql with the same
    pruned scan as the DataFrame path."""
    now = 1700000000
    s = WhisperStore.create(spark, str(tmp_path / "db"), [(60, 120), (3600, 48)])
    s.update_many(
        [(now - 60 * i, float(i)) for i in range(1, 5)], now=now, metric="m.a"
    )
    # overwrite one slot: the series view must show only the last write
    s.update("m.a", 99.0, now - 60, now=now)
    names = s.create_views("t")
    assert names == ["t_points", "t_series", "t_metrics"]
    n_raw = spark.sql("SELECT count(*) c FROM t_points").first()["c"]
    live = spark.sql(
        "SELECT ts, value FROM t_series WHERE metric = 'm.a' AND resolution = 60"
    ).collect()
    assert n_raw >= len(live) >= 4
    got = {r["ts"]: r["value"] for r in live}
    assert got[(now - 60) - (now - 60) % 60] == 99.0   # LWW applied
    assert spark.sql("SELECT * FROM t_metrics").first()["metric"] == "m.a"
    # the view resolves to the same partition-pruned scan
    plan = spark.sql(
        "SELECT * FROM t_series WHERE resolution = 60"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_read_storage_schemas_conf(tmp_path, spark):
    """Carbon conf files drive reconcile_policies unchanged."""
    from whisper_spark.maintenance import (
        read_storage_schemas,
        reconcile_policies,
    )
    from whisper_spark.store import WhisperStore

    (tmp_path / "storage-schemas.conf").write_text(
        "[servers]\n"
        "pattern = ^servers\\.\n"
        "retentions = 1m:1h,5m:2h\n"
        "\n"
        "[default]\n"
        "pattern = .*\n"
        "retentions = 5m:2h\n"
    )
    (tmp_path / "storage-aggregation.conf").write_text(
        "[servers]\n"
        "pattern = ^servers\\.\n"
        "xFilesFactor = 0.1\n"
        "aggregationMethod = max\n"
    )
    rules = read_storage_schemas(
        str(tmp_path / "storage-schemas.conf"),
        str(tmp_path / "storage-aggregation.conf"),
    )
    # carbon's metric-name anchor re-targets to a path-segment boundary
    assert rules[0].pattern == r"^(.*/)?servers\."
    assert rules[0].archives == "1m:1h,5m:2h"
    assert rules[0].source == "schemas"
    assert rules[1].pattern.endswith(".*")
    assert rules[0].matches("servers.web1.cpu")
    assert rules[0].matches("/data/stores/servers.web1.cpu")
    assert not rules[0].matches("/data/stores/apps.servers1.cpu")
    # aggregation rules stay SEPARATE (carbon matches the two conf
    # files independently), tagged with their source file
    agg = [r for r in rules if r.source == "aggregation"]
    assert len(agg) == 1
    assert agg[0].x_files_factor == 0.1 and agg[0].aggregation_method == "max"

    # a drifted store under a matching path gets reported
    root = tmp_path / "stores"
    s = WhisperStore.create(
        spark, str(root / "servers.web1.cpu"), [(60, 120)],
        x_files_factor=0.5, aggregation_method="average",
    )
    assert s is not None
    report = reconcile_policies(spark, str(root), rules, apply=False)
    assert len(report) == 1
    drift = " ".join(report[0]["drift"])
    assert "archives" in drift and "aggregation" in drift and "xff" in drift


def test_storage_aggregation_pattern_divergent_from_schemas(tmp_path, spark):
    """An aggregation rule whose pattern differs from EVERY schemas
    pattern still governs stores matched by a schemas rule — carbon
    first-matches the two conf files independently per metric."""
    from whisper_spark.maintenance import (
        read_storage_schemas,
        reconcile_policies,
    )
    from whisper_spark.store import WhisperStore

    (tmp_path / "storage-schemas.conf").write_text(
        "[everything]\n"
        "pattern = .*\n"
        "retentions = 1m:2h\n"
    )
    # pattern shares no byte with the schemas pattern
    (tmp_path / "storage-aggregation.conf").write_text(
        "[counters]\n"
        "pattern = \\.count$\n"
        "xFilesFactor = 0\n"
        "aggregationMethod = sum\n"
    )
    rules = read_storage_schemas(
        str(tmp_path / "storage-schemas.conf"),
        str(tmp_path / "storage-aggregation.conf"),
    )
    root = tmp_path / "stores"
    WhisperStore.create(
        spark, str(root / "servers.web1.requests.count"), [(60, 120)],
        x_files_factor=0.5, aggregation_method="average",
    )
    report = reconcile_policies(spark, str(root), rules, apply=False)
    assert len(report) == 1
    drift = " ".join(report[0]["drift"])
    # schemas rule ([everything]) governs archives — matches, no drift;
    # aggregation rule ([counters]) governs method+xff — both drifted
    assert "archives" not in drift
    assert "aggregation average != sum" in drift and "xff" in drift
    # and applying fixes the header drift
    report2 = reconcile_policies(spark, str(root), rules, apply=True)
    assert report2[0]["fixed"]
    s = WhisperStore.open(spark, str(root / "servers.web1.requests.count"))
    assert s.aggregation_method == "sum" and s.x_files_factor == 0.0
    assert reconcile_policies(spark, str(root), rules, apply=False) == []


def test_cli_dump_logical_contents(store, capsys):
    """whisper-dump analog: the header json plus one line per stored
    row (resolution, metric, ts, value, wseq) — every written point
    appears, LWW duplicates included (dump is the PHYSICAL view; the
    reference's whisper-dump prints raw archive slots the same way)."""
    # write an overwrite so dump shows BOTH physical rows for one slot
    store.update_many([(NOW - 5, 99.5)], now=NOW, metric="m")
    assert run_cli(["dump", store.path]) == 0
    out = capsys.readouterr().out
    head, _, body = out.partition("\n}\n")
    info = json.loads(head + "\n}")
    assert info["maxRetention"] == 3600
    lines = [ln for ln in body.strip().splitlines() if ln]
    # 39 originals + 1 overwrite + the 1m rollup rows from propagation
    assert len(lines) >= 40
    slot = [ln for ln in lines if f" m {NOW - 5} " in ln]
    assert len(slot) == 2  # original + overwrite, distinct wseq
    assert any("99.5" in ln for ln in slot)
    wseqs = [ln.rsplit("wseq ", 1)[1].rstrip(")") for ln in slot]
    assert len(set(wseqs)) == 2
    # every line carries a known resolution prefix
    assert all(ln.split(":", 1)[0] in ("1", "60") for ln in lines)
