"""Registry output-schema contract: every cell the harness hashes
must be SCALAR. The external driver's canonicalizer sorts a pandas
frame over all output columns and hard-errors on unhashable list
cells (the q293 round-12 red — `TypeError: unhashable type: 'list'`),
so a complex-typed output column is a harness contract violation even
when the values are correct. Complement: tools/check.py's canon() now
raises on list/tuple/dict cells, so the local mirror can never accept
more than the driver again.
"""

from __future__ import annotations

import pytest

from metadata_ingestion_poc_spark.queries import QUERIES

_COMPLEX = ("array", "map", "struct")


def test_no_complex_types_in_any_registered_output(spark, sf_dir):
    """Build every registered query's DataFrame and reject ArrayType /
    MapType / StructType output columns. Schema-only (nothing is
    collected beyond what query construction itself materializes)."""
    bad: dict[str, dict[str, str]] = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        offenders = {
            f.name: f.dataType.simpleString()
            for f in df.schema.fields
            if f.dataType.simpleString().startswith(_COMPLEX)
        }
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "complex-typed output cells (scalarize with array_join / "
        f"to_json): {bad}"
    )


def test_mirror_canon_rejects_complex_cells():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check", "/root/repo/tools/check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.canon(True) == "1"
    assert mod.canon(3) == "3"
    with pytest.raises(TypeError, match="complex-typed"):
        mod.canon([1, 2])
    with pytest.raises(TypeError, match="complex-typed"):
        mod.canon(("a",))
    with pytest.raises(TypeError, match="complex-typed"):
        mod.canon({"k": 1})
