"""Bridge-join resolution.

The reference resolves each relation's AUI endpoints to codes by
probing in-memory dicts per row (terms() at umls2rdf.py:698-727:
atoms_by_aui[aui_source] / [aui_target], drop self-loops, keep the
1:1 cases). Spark shape: two hash joins against the atom bridge
(AUI→code), then a filter — fully distributed, no driver dict.

Scale note: the bridge (id→code) is a projection of the biggest
table, so these are shuffle joins on the id; bucketing both sides by
the id makes them co-located at 100 TB. The self-loop filter runs
between the joins so the second join sees fewer rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_endpoints(
    rels: DataFrame,
    bridge: DataFrame,
    source_id: str,
    target_id: str,
    bridge_id: str,
    bridge_code: str,
    source_out: str = "source_code",
    target_out: str = "target_code",
    drop_self_loops: bool = True,
) -> DataFrame:
    """Map rel endpoint ids to codes via the bridge, dropping rels
    whose endpoints don't both resolve (inner joins — the reference
    raises on unresolved and skips code_source==code_target,
    umls2rdf.py:715-727)."""
    src_bridge = bridge.select(
        F.col(bridge_id).alias("__src_id"), F.col(bridge_code).alias(source_out)
    ).dropDuplicates(["__src_id", source_out])
    tgt_bridge = bridge.select(
        F.col(bridge_id).alias("__tgt_id"), F.col(bridge_code).alias(target_out)
    ).dropDuplicates(["__tgt_id", target_out])
    out = rels.join(src_bridge, rels[source_id] == F.col("__src_id"), "inner")
    if drop_self_loops:
        # cheap pre-filter before the second shuffle where possible
        out = out.join(tgt_bridge, out[target_id] == F.col("__tgt_id"), "inner")
        out = out.where(F.col(source_out) != F.col(target_out))
    else:
        out = out.join(tgt_bridge, out[target_id] == F.col("__tgt_id"), "inner")
    return out.drop("__src_id", "__tgt_id")
