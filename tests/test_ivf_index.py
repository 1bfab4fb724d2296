"""Physical IVF index: the cell-partitioned layout must (a) answer probes
value-identically to the in-memory q29, and (b) actually prune — the index
scan's PartitionFilters must carry the probe-cell literal so unprobed cell
directories are skipped."""

import os

import __spark_entry__ as entry_mod
from supermusr_data_pipeline_spark.plans.ivf_index import (
    ivf_index_path,
    probe_ivf_index,
    write_ivf_index,
)
from supermusr_data_pipeline_spark.plans.text_dedup import _N_CELLS, _N_PROBE

SF_DIR = "/root/testdata/sf0.001"


def test_indexed_probe_matches_q29_exactly(spark):
    q = entry_mod.queries()
    indexed = {tuple(r) for r in q["q64_ivf_indexed_probe"](spark, SF_DIR).collect()}
    in_memory = {tuple(r) for r in q["q29_ivf_ann"](spark, SF_DIR).collect()}
    assert indexed == in_memory


def test_index_layout_one_directory_per_cell(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_ivf_index(spark, SF_DIR, path)
    cells = sorted(d for d in os.listdir(path) if d.startswith("cell="))
    assert cells == [f"cell={k}" for k in range(_N_CELLS)]


def test_probe_scan_is_partition_pruned(spark):
    """A single query probes _N_PROBE of _N_CELLS cells; the index scan
    must show that literal as a PartitionFilter (file skipping), and the
    result must contain only probed cells."""
    path = ivf_index_path(SF_DIR)
    if not os.path.exists(path):
        write_ivf_index(spark, SF_DIR, path)
    df = probe_ivf_index(spark, SF_DIR, path, query_filter="vec_id = 0")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        line for line in plan.splitlines() if "PartitionFilters: [cell" in line
    )
    assert " IN (" in scan
    probed = {r.cell for r in df.select("cell").distinct().collect()}
    assert len(probed) <= _N_PROBE < _N_CELLS


def test_sq8_indexed_probe_matches_q51_exactly(spark):
    q = entry_mod.queries()
    indexed = {tuple(r) for r in q["q76_ivf_sq8_indexed"](spark, SF_DIR).collect()}
    in_memory = {tuple(r) for r in q["q51_ivf_sq8_ann"](spark, SF_DIR).collect()}
    assert indexed == in_memory


def test_sq8_scan_reads_codes_not_vectors(spark):
    """The memory-bound claim, proven on the plan: the approx-phase index
    scan's ReadSchema must carry codes and NOT emb (parquet column
    pruning); emb appears only in the shortlist fetch scan.  Both index
    scans stay partition-pruned."""
    from supermusr_data_pipeline_spark.plans.ivf_index import (
        ivf_sq8_index_path,
        probe_ivf_sq8_index,
        write_ivf_sq8_index,
    )

    path = ivf_sq8_index_path(SF_DIR)
    if not os.path.exists(path):
        write_ivf_sq8_index(spark, SF_DIR, path)
    df = probe_ivf_sq8_index(spark, SF_DIR, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        line for line in plan.splitlines()
        if "FileScan parquet" in line and "supermusr_ivf_sq8_index" in line
    ]
    code_scans = [s for s in scans if "codes" in s]
    assert code_scans, "approx scan over the index must exist"
    for s in code_scans:
        assert "emb" not in s.split("ReadSchema")[-1], "scan path must not read emb"
    assert any("PartitionFilters: [cell" in s for s in scans)


def test_index_build_is_retry_stable(spark, tmp_path):
    """Two independent builds of the same corpus produce identical row
    sets — the property that makes the index a rebuildable artifact (a
    failed write job can simply re-run; no rand(), no timestamps)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_ivf_index(spark, SF_DIR, a)
    write_ivf_index(spark, SF_DIR, b)
    ra = {(r.vec_id, r.cell, tuple(r.emb)) for r in spark.read.parquet(a).collect()}
    rb = {(r.vec_id, r.cell, tuple(r.emb)) for r in spark.read.parquet(b).collect()}
    assert ra == rb


def test_sq8_index_build_is_retry_stable(spark, tmp_path):
    from supermusr_data_pipeline_spark.plans.ivf_index import write_ivf_sq8_index

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_ivf_sq8_index(spark, SF_DIR, a)
    write_ivf_sq8_index(spark, SF_DIR, b)
    ra = {(r.vec_id, r.cell, tuple(r.codes)) for r in spark.read.parquet(a).collect()}
    rb = {(r.vec_id, r.cell, tuple(r.codes)) for r in spark.read.parquet(b).collect()}
    assert ra == rb
