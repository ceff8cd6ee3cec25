"""End-to-end UMLS ontology → Turtle export as one DataFrame plan.

This is the Spark rebuild of the reference's whole pipeline
(UmlsOntology at umls2rdf.py:536, UmlsClass.toRDF at umls2rdf.py:391):
the reference loads every table into driver RAM and loops over codes;
here each per-class component (preferred label, alt labels,
definitions, resolved relations, attributes, semantic types, root
flags) is an independent aggregation joined on the class code, and the
Turtle block is rendered by a single projection — so a 100 TB UMLS-
shaped corpus exports with ~6 shuffles total, all on the class key.

Rendering mirrors the reference byte-for-byte where the reference is
deterministic; where it depends on MySQL row order (tie-breaks among
equally-ranked atoms), we use an explicit total order (documented on
each function).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.functions.text import UMLS_LANGCODE_MAP, url_term
from umls2rdf_spark.rdf.turtle import (
    HAS_CUI,
    HAS_STY,
    HAS_TUI,
    STY_URL,
    class_header,
    lang_literal_list,
    literal_triple,
    object_triple,
    subclass_triple,
    tq,
)

# Bogus hierarchy parents skipped by the reference (umls2rdf.py:438-446).
BOGUS_PARENTS = ("ICD-10-CM", "138875005", "V-HL7V3.0", "C1553931")

_OWL_THING_SUB = "\trdfs:subClassOf owl:Thing ;\n"

# write_properties always declares hasSTY before the MRDOC-derived
# properties (umls2rdf.py:801-811); template is toRDFWithDesc
# (umls2rdf.py:501-508) byte-for-byte, including its "    \t" indent.
HASSTY_PROPERTY_BLOCK = (
    "umls:hasSTY a owl:ObjectProperty ;\n"
    '    \trdfs:label """Semantic type UMLS property""";\n'
    '    \trdfs:comment """Semantic type UMLS property""" .\n'
    "    \n"
)


def filter_atoms(
    mrconso: DataFrame, ont_code: str, lat: str, load_on_cuis: bool
) -> DataFrame:
    """MRCONSO scan for one ontology: SAB/LAT/SUPPRESS filters pushed
    to the source (load_tables at umls2rdf.py:598-605), plus the class
    key column (CODE or CUI, get_code at umls2rdf.py:142)."""
    # case-insensitive LAT match: the reference lowercases MRSAB.LAT
    # and relies on MySQL's case-insensitive collation
    # (umls2rdf.py:594-599); Spark compares case-sensitively.
    atoms = mrconso.where(
        (F.col("SAB") == ont_code)
        & (F.lower(F.col("LAT")) == lat.lower())
        & (F.col("SUPPRESS") == "N")
    )
    code = F.col("CUI") if load_on_cuis else F.col("CODE")
    return atoms.withColumn("code", code).where(
        F.col("code").isNotNull() & (F.col("code") != "")
    )


def root_cuis(mrconso: DataFrame, ont_code: str) -> DataFrame:
    """SRC 'V-<ont>' atoms → root CUI set (umls2rdf.py:612-617)."""
    return (
        mrconso.where(
            (F.col("SAB") == "SRC") & (F.col("CODE") == f"V-{ont_code}")
        )
        .select(F.col("CUI").alias("root_cui"))
        .distinct()
    )


def pref_labels(
    atoms: DataFrame, mrrank: DataFrame, ont_code: str, load_on_cuis: bool
) -> DataFrame:
    """One preferred label per code.

    Code mode (umls2rdf.py:320-332): max MRRANK rank wins, fallback
    'P' in TTY. Cuis mode (umls2rdf.py:295-319): ISPREF='Y' →
    STT='PF' → TTY starts with 'P' cascade. Both collapse to one
    window top-1 with a multi-key ordering; AUI breaks the ties the
    reference leaves to MySQL row order.
    """
    from pyspark.sql import Window

    if load_on_cuis:
        order = [
            F.when(F.col("ISPREF") == "Y", 0).otherwise(1).asc(),
            F.when(F.col("STT") == "PF", 0).otherwise(1).asc(),
            F.when(F.col("TTY").startswith("P"), 0).otherwise(1).asc(),
            F.col("AUI").asc(),
        ]
        ranked = atoms
    else:
        rank_dim = (
            mrrank.where(F.col("SAB") == ont_code)
            .select(
                F.col("TTY"), F.col("RANK").cast("int").alias("tty_rank")
            )
            # guard: a duplicated (SAB, TTY) rank row must not fan out
            # the atom side through the join (the reference indexes
            # rank_by_tty[tty][0], i.e. first row wins)
            .groupBy("TTY")
            .agg(F.max("tty_rank").alias("tty_rank"))
        )
        ranked = atoms.join(F.broadcast(rank_dim), on="TTY", how="left")
        order = [
            F.col("tty_rank").desc_nulls_last(),
            F.when(F.col("TTY").contains("P"), 0).otherwise(1).asc(),
            F.col("AUI").asc(),
        ]
    w = Window.partitionBy("code").orderBy(*order)
    return (
        ranked.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("code", F.col("STR").alias("pref_label"))
    )


def source_resolved_rels(
    mrrel: DataFrame, atoms: DataFrame, ont_code: str, load_on_cuis: bool
) -> DataFrame:
    """Rels with the SOURCE endpoint resolved to a class code but the
    target still unresolved — the stage at which the reference checks
    root-ness (terms() at umls2rdf.py:689-713 runs the cui_roots test
    before the target-code checks, so rels pointing at out-of-ontology
    atoms, e.g. the SRC hierarchy root, still count)."""
    rels = mrrel.where(
        (F.col("SAB") == ont_code) & (F.col("SUPPRESS") == "N")
    ).select("CUI1", "AUI1", "REL", "CUI2", "AUI2", "RELA")
    if load_on_cuis:
        return rels.select(
            F.col("CUI2").alias("code"), "REL", "RELA", "CUI1", "AUI1"
        )
    bridge = atoms.select(F.col("AUI"), F.col("code")).dropDuplicates(["AUI"])
    src = bridge.select(
        F.col("AUI").alias("__aui2"), F.col("code").alias("code")
    )
    return rels.join(src, rels["AUI2"] == F.col("__aui2"), "inner").select(
        "code", "REL", "RELA", "CUI1", "AUI1"
    )


def resolved_rels(
    mrrel: DataFrame, atoms: DataFrame, ont_code: str, load_on_cuis: bool
) -> DataFrame:
    """Per-class relations with BOTH endpoint codes.

    Code mode: AUI2→source code, AUI1→target code through the atom
    bridge, self-maps dropped (terms() at umls2rdf.py:698-727).
    Cuis mode: CUI2/CUI1 are already the codes (umls2rdf.py:692-697).
    Returns (code, REL, RELA, CUI1, target_code).
    """
    src_resolved = source_resolved_rels(mrrel, atoms, ont_code, load_on_cuis)
    if load_on_cuis:
        return src_resolved.select(
            "code", "REL", "RELA", "CUI1", F.col("CUI1").alias("target_code")
        )
    bridge = atoms.select(F.col("AUI"), F.col("code")).dropDuplicates(["AUI"])
    tgt = bridge.select(
        F.col("AUI").alias("__aui1"), F.col("code").alias("target_code")
    )
    return (
        src_resolved.join(
            tgt, src_resolved["AUI1"] == F.col("__aui1"), "inner"
        )
        .where(F.col("code") != F.col("target_code"))
        .select("code", "REL", "RELA", "CUI1", "target_code")
    )


def _fragment() -> Column:
    """RELA if non-empty else REL (get_rel_fragment, umls2rdf.py:131)."""
    return F.when(
        F.col("RELA").isNotNull() & (F.col("RELA") != ""), F.col("RELA")
    ).otherwise(F.col("REL"))


def term_blocks(
    tables: dict[str, DataFrame],
    ont_code: str,
    ns: str,
    lat: str = "eng",
    load_on_cuis: bool = False,
    hierarchy: bool = True,
    tree: DataFrame | None = None,
    dedupe: bool = True,
) -> DataFrame:
    """(code, ttl) — one rendered Turtle class block per code,
    byte-compatible with UmlsClass.toRDF (umls2rdf.py:391-490).

    ``tree`` is the (parent, child) mesh tree for MSH-style exports
    (tree parents emitted instead of CHD rels, hierarchy=False).
    """
    lang = UMLS_LANGCODE_MAP[lat.lower()]
    mrconso = tables["MRCONSO"]
    atoms = filter_atoms(mrconso, ont_code, lat, load_on_cuis)
    pref = pref_labels(
        atoms, tables.get("MRRANK", _empty_like(mrconso, "RANK SAB TTY SUPPRESS")),
        ont_code, load_on_cuis,
    )
    roots = root_cuis(mrconso, ont_code)

    # ── alt labels: sorted distinct STR != prefLabel ────────────────
    alts = (
        atoms.join(pref, "code")
        .where(F.col("STR") != F.col("pref_label"))
        .groupBy("code")
        .agg(F.array_sort(F.collect_set("STR")).alias("alt_labels"))
    )

    # ── definitions: join by AUI (code mode) / CUI (cuis mode) ─────
    mrdef = tables.get("MRDEF")
    if mrdef is not None:
        defkey = "CUI" if load_on_cuis else "AUI"
        defs = (
            mrdef.where(F.col("SAB") == ont_code)
            .join(
                atoms.select(defkey, "code").dropDuplicates([defkey, "code"]),
                on=defkey,
            )
            .groupBy("code")
            .agg(F.array_sort(F.collect_set("DEF")).alias("defs"))
        )
    else:
        defs = None

    # ── relations: classified, ordered, rendered ────────────────────
    rels = resolved_rels(tables["MRREL"], atoms, ont_code, load_on_cuis)
    # root detection (umls2rdf.py:692-713): CHD rel whose CUI1 is a
    # root CUI (code mode requires REL='CHD'; cuis mode any rel);
    # ICD10CM's patched root parent included. Checked on the
    # SOURCE-resolved rels — the reference tests root-ness before the
    # target-code checks, so rels pointing at out-of-ontology atoms
    # (the SRC hierarchy root itself) still count.
    src_rels = source_resolved_rels(
        tables["MRREL"], atoms, ont_code, load_on_cuis
    )
    root_cond = F.col("__is_root_cui").isNotNull()
    if not load_on_cuis:
        root_cond = root_cond & (F.col("REL") == "CHD")
        if ont_code == "ICD10CM":
            root_cond = root_cond | (
                (F.col("CUI1") == "C3264380") & (F.col("REL") == "CHD")
            )
    rels_flagged = src_rels.join(
        F.broadcast(roots.withColumn("__is_root_cui", F.lit(1))),
        src_rels["CUI1"] == F.col("root_cui"),
        "left",
    )
    is_root = rels_flagged.where(root_cond).select("code").distinct().withColumn(
        "is_root", F.lit(True)
    )

    emit_sub = (
        (F.col("REL") == "CHD")
        & F.lit(hierarchy)
        & F.lit(tree is None)
        & ~F.col("target_code").isin(*BOGUS_PARENTS)
    )
    emit_obj = (F.col("REL") != "PAR") & ~(
        (F.col("REL") == "CHD") & F.lit(hierarchy)
    )
    rendered_rel = F.when(
        emit_sub, subclass_triple(url_term(ns, F.col("target_code")))
    ).when(
        emit_obj,
        object_triple(
            url_term(ns, _fragment()), url_term(ns, F.col("target_code"))
        ),
    )
    rel_segments = (
        rels.withColumn("__seg", rendered_rel)
        .where(F.col("__seg").isNotNull())
        .groupBy("code")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.when(F.col("REL") == "CHD", 0)
                            .otherwise(1)
                            .alias("k1"),
                            _fragment().alias("k2"),
                            F.col("target_code").alias("k3"),
                            F.col("code").alias("k4"),
                            F.col("__seg").alias("seg"),
                        )
                    )
                ),
                lambda s: s["seg"],
            ).alias("rel_segs")
        )
    )
    # ── tree parents (MSH mesh tree, umls2rdf.py:423-426) ──────────
    if tree is not None:
        tree_segments = (
            tree.groupBy(F.col("child").alias("code"))
            .agg(F.array_sort(F.collect_set("parent")).alias("parents"))
            .select(
                "code",
                F.transform(
                    F.col("parents"), lambda p: subclass_triple(url_term(ns, p))
                ).alias("tree_segs"),
            )
        )
    else:
        tree_segments = None

    # ── attributes (umls2rdf.py:457-474) ────────────────────────────
    mrsat = tables.get("MRSAT")
    if mrsat is not None:
        attkey = "CUI" if load_on_cuis else "CODE"
        # the reference filters CODE IS NOT NULL even when keying by
        # CUI (mrsat_filt at umls2rdf.py:643); the key column is
        # additionally non-null/non-empty so rows land on a class.
        atts = mrsat.where(
            (F.col("SAB") == ont_code)
            & F.col("CODE").isNotNull()
            & F.col(attkey).isNotNull()
            & (F.col(attkey) != "")
            & (F.col("ATN") != "AQ")
        ).select(F.col(attkey).alias("code"), "ATN", "ATV")
        atts = atts.join(
            atoms.select("code").distinct(), on="code", how="left_semi"
        )
        mn_root = (
            F.lit(tree is not None)
            & (F.col("ATN") == "MN")
            & F.col("code").startswith("D")
            & (F.size(F.split(F.col("ATV"), "\\.")) == 1)
        )
        att_arr = F.when(
            mn_root,
            F.array(
                F.lit(_OWL_THING_SUB),
                literal_triple(url_term(ns, F.col("ATN")), F.col("ATV")),
            ),
        ).otherwise(
            F.array(literal_triple(url_term(ns, F.col("ATN")), F.col("ATV")))
        )
        att_segments = (
            atts.withColumn("__segs", att_arr)
            .groupBy("code")
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("ATN").alias("k1"),
                                    F.col("ATV").alias("k2"),
                                    F.col("__segs").alias("segs"),
                                )
                            )
                        ),
                        lambda s: s["segs"],
                    )
                ).alias("att_segs")
            )
        )
    else:
        att_segments = None

    # ── semantic types: CUIs + TUIs per code (umls2rdf.py:477-488) ──
    cuis = atoms.groupBy("code").agg(
        F.array_sort(F.collect_set("CUI")).alias("cuis")
    )
    mrsty = tables.get("MRSTY")
    if mrsty is not None:
        tuis = (
            atoms.select("code", "CUI")
            .distinct()
            .join(mrsty.select("CUI", "TUI").distinct(), on="CUI")
            .groupBy("code")
            .agg(F.array_sort(F.collect_set("TUI")).alias("tuis"))
        )
    else:
        tuis = None

    # ── assemble one row per code ───────────────────────────────────
    base = pref
    for part in (alts, defs, rel_segments, tree_segments, att_segments,
                 cuis, tuis, is_root):
        if part is not None:
            base = base.join(part, on="code", how="left")
    empty_arr = F.array().cast("array<string>")
    base = (
        base.withColumn("alt_labels", F.coalesce(F.col("alt_labels"), empty_arr))
        .withColumn(
            "defs",
            F.coalesce(F.col("defs"), empty_arr) if defs is not None else empty_arr,
        )
        .withColumn("rel_segs", F.coalesce(F.col("rel_segs"), empty_arr))
        .withColumn(
            "tree_segs",
            F.coalesce(F.col("tree_segs"), empty_arr)
            if tree_segments is not None
            else empty_arr,
        )
        .withColumn(
            "att_segs",
            F.coalesce(F.col("att_segs"), empty_arr)
            if att_segments is not None
            else empty_arr,
        )
        .withColumn("cuis", F.coalesce(F.col("cuis"), empty_arr))
        .withColumn(
            "tuis",
            F.coalesce(F.col("tuis"), empty_arr) if tuis is not None else empty_arr,
        )
        .withColumn("is_root", F.coalesce(F.col("is_root"), F.lit(False)))
    )

    url = url_term(ns, F.col("code"))
    header = class_header(url, F.col("pref_label"), F.col("code"), lang)
    alt_part = F.when(
        F.size("alt_labels") > 0,
        F.concat(
            F.lit("\tskos:altLabel "),
            lang_literal_list(F.col("alt_labels"), lang),
            F.lit(" ;\n"),
        ),
    ).otherwise(F.lit(""))
    defs_part = F.when(
        F.size("defs") > 0,
        F.concat(
            F.lit("\tskos:definition "),
            lang_literal_list(F.col("defs"), lang),
            F.lit(" ;\n"),
        ),
    ).otherwise(F.lit(""))
    root_arr = F.when(
        F.col("is_root"), F.array(F.lit(_OWL_THING_SUB))
    ).otherwise(empty_arr)
    all_segs = F.concat(
        root_arr, F.col("tree_segs"), F.col("rel_segs"), F.col("att_segs")
    )
    if dedupe:
        all_segs = F.array_distinct(all_segs)
    # the root segment renders between altLabels and defs; drop it
    # from the tail (dedupe keeps it at index 0 when present)
    tail = F.when(
        F.col("is_root"), F.slice(all_segs, 2, F.size(all_segs))
    ).otherwise(all_segs)
    root_part = F.when(F.col("is_root"), F.lit(_OWL_THING_SUB)).otherwise(
        F.lit("")
    )
    cui_lines = F.concat_ws(
        "",
        F.transform(
            F.col("cuis"),
            lambda c: F.concat(
                F.lit(f"\t{HAS_CUI} "), tq(c), F.lit("^^xsd:string ;\n")
            ),
        ),
    )
    tui_lines = F.concat_ws(
        "",
        F.transform(
            F.col("tuis"),
            lambda t: F.concat(
                F.lit(f"\t{HAS_TUI} "), tq(t), F.lit("^^xsd:string ;\n")
            ),
        ),
    )
    # hasSTY objects use get_umls_url("STY") = UMLS_BASE_URI + "STY/"
    # (umls2rdf.py:488, conf UMLS_BASE_URI), not the bioportal prefix.
    sty_ns = "http://purl.bioontology.org/ontology/STY/"
    sty_lines = F.concat_ws(
        "",
        F.transform(
            F.col("tuis"),
            lambda t: F.concat(
                F.lit(f"\t{HAS_STY} <{sty_ns}"), t, F.lit("> ;\n")
            ),
        ),
    )
    block = F.concat(
        header,
        alt_part,
        root_part,
        defs_part,
        F.concat_ws("", tail),
        cui_lines,
        tui_lines,
        sty_lines,
        F.lit(" .\n\n"),
    )
    return base.select("code", block.alias("ttl"))


def mesh_tree(mrrel: DataFrame, mrconso: DataFrame) -> DataFrame:
    """MSH parent/child code pairs (mesh_tree at umls2rdf.py:201-217):
    MRREL CHD rows joined through MRCONSO on both CUIs, D-codes only,
    distinct."""
    rels = mrrel.where((F.col("SAB") == "MSH") & (F.col("REL") == "CHD"))
    c1 = mrconso.where(
        (F.col("SAB") == "MSH") & F.col("CODE").startswith("D")
    ).select(F.col("CUI").alias("__pcui"), F.col("CODE").alias("parent"))
    c2 = mrconso.where(
        (F.col("SAB") == "MSH") & F.col("CODE").startswith("D")
    ).select(F.col("CUI").alias("__ccui"), F.col("CODE").alias("child"))
    return (
        rels.join(c1, rels["CUI1"] == F.col("__pcui"))
        .join(c2, rels["CUI2"] == F.col("__ccui"))
        .select("parent", "child")
        .distinct()
    )


def semantic_types_lines(
    mrsty: DataFrame, with_roots: bool = False
) -> DataFrame:
    """STY hierarchy Turtle lines (generate_semantic_types,
    umls2rdf.py:153-189): one owl:Class block per TUI plus
    rdfs:subClassOf edges derived from the STN prefix tree.

    Returns (sort_key, line); order by sort_key for a deterministic
    document (the reference emits in DB scan order).
    """
    sty_url = "http://purl.bioontology.org/ontology/STY/"
    nodes = mrsty.select("TUI", "STN", "STY").distinct()
    term_line = F.concat(
        F.lit(f"<{sty_url}"), F.col("TUI"),
        F.lit("> a owl:Class ;\n\tskos:notation \""), F.col("TUI"),
        F.lit("\"^^xsd:string ;\n\tskos:prefLabel \""), F.col("STY"),
        F.lit("\"@en .\n"),
    )
    terms = nodes.select(
        F.concat(F.lit("0:"), F.col("TUI")).alias("sort_key"),
        term_line.alias("line"),
    )
    parent_stn = F.when(
        F.col("STN").contains("."),
        F.regexp_replace(F.col("STN"), "\\.[^.]*$", ""),
    ).otherwise(F.expr("substring(STN, 1, length(STN) - 1)"))
    child = nodes.select(
        F.col("TUI").alias("child_tui"),
        F.col("STN").alias("child_stn"),
        parent_stn.alias("parent_stn"),
    )
    parent = nodes.select(
        F.col("TUI").alias("parent_tui"), F.col("STN").alias("p_stn")
    )
    edges = (
        child.join(parent, child["parent_stn"] == parent["p_stn"], "left")
        .where(
            F.col("parent_tui").isNotNull()
            & (F.col("parent_tui") != F.col("child_tui"))
        )
        .select(
            F.concat(
                F.lit("1:"), F.col("child_tui"), F.lit(":"), F.col("parent_tui")
            ).alias("sort_key"),
            F.concat(
                F.lit(f"<{sty_url}"), F.col("child_tui"),
                F.lit(f"> rdfs:subClassOf <{sty_url}"), F.col("parent_tui"),
                F.lit("> ."),
            ).alias("line"),
        )
    )
    out = terms.unionByName(edges)
    if with_roots:
        has_parent = (
            child.join(parent, child["parent_stn"] == parent["p_stn"], "inner")
            .where(F.col("parent_tui") != F.col("child_tui"))
            .select(F.col("child_tui").alias("TUI"))
            .distinct()
        )
        root_lines = (
            nodes.join(has_parent, on="TUI", how="left_anti")
            .select(
                F.concat(F.lit("1:"), F.col("TUI"), F.lit(":~")).alias(
                    "sort_key"
                ),
                F.concat(
                    F.lit(f"<{sty_url}"), F.col("TUI"),
                    F.lit("> rdfs:subClassOf owl:Thing ."),
                ).alias("line"),
            )
        )
        out = out.unionByName(root_lines)
    return out


def used_properties(
    tables: dict[str, DataFrame],
    ont_code: str,
    lat: str = "eng",
    load_on_cuis: bool = False,
    hierarchy: bool = True,
) -> DataFrame:
    """Distinct property names an export will emit: object-property
    fragments from rels + datatype ATNs from atts (the ont_properties
    dict the reference accumulates per term, umls2rdf.py:453-474).
    Returns (att) one column."""
    atoms = filter_atoms(tables["MRCONSO"], ont_code, lat, load_on_cuis)
    rels = resolved_rels(tables["MRREL"], atoms, ont_code, load_on_cuis)
    emit_obj = (F.col("REL") != "PAR") & ~(
        (F.col("REL") == "CHD") & F.lit(hierarchy)
    )
    frags = rels.where(emit_obj).select(_fragment().alias("att")).distinct()
    mrsat = tables.get("MRSAT")
    if mrsat is None:
        return frags
    attkey = "CUI" if load_on_cuis else "CODE"
    atns = (
        mrsat.where(
            (F.col("SAB") == ont_code)
            & F.col("CODE").isNotNull()  # umls2rdf.py:643, both modes
            & F.col(attkey).isNotNull()
            & (F.col(attkey) != "")
            & (F.col("ATN") != "AQ")
        )
        .select(F.col("ATN").alias("att"))
        .distinct()
    )
    return frags.unionByName(atns).distinct()


def property_blocks(
    mrdoc: DataFrame, props: DataFrame, ns: str
) -> DataFrame:
    """Rendered owl property declarations (UmlsAttribute.toRDF at
    umls2rdf.py:511-532 + MRDOC digestion at umls2rdf.py:853-864).

    ``props``: one 'att' column of property names used by the export.
    Properties lacking an expanded_form are dropped (the reference
    raises; at scale we surface them by anti-join instead of failing
    the export).
    """
    docs = mrdoc.groupBy("VALUE").agg(
        F.min("DOCKEY").alias("dockey"),
        F.max(
            F.when(F.col("TYPE") == "expanded_form", F.col("EXPL"))
        ).alias("expanded_form"),
        F.max(
            F.when(F.col("TYPE").contains("inverse"), F.col("EXPL"))
        ).alias("inverse"),
    )
    joined = props.join(
        F.broadcast(docs), props["att"] == docs["VALUE"], "inner"
    ).where(F.col("expanded_form").isNotNull())
    desc = F.when(
        F.col("inverse").isNotNull(),
        F.concat(F.lit("Inverse of "), F.col("inverse")),
    ).otherwise(F.col("expanded_form"))
    ptype = F.when(F.col("dockey").contains("REL"), F.lit("ObjectProperty")).when(
        F.col("dockey") == "ATN", F.lit("DatatypeProperty")
    )
    # label: att; if len(desc) < 20 use desc; if '_' in that label,
    # rebuild from att with spaces and capitalize (umls2rdf.py:522-527)
    label1 = F.when(F.length(desc) < 20, desc).otherwise(F.col("att"))
    spaced = F.concat_ws(" ", F.split(F.col("att"), "_"))
    label = F.when(
        label1.contains("_"),
        F.concat(
            F.upper(F.substring(spaced, 1, 1)), F.expr(
                "substring(concat_ws(' ', split(att, '_')), 2)"
            )
        ),
    ).otherwise(label1)
    uri = url_term(ns, F.col("att"))
    block = F.concat(
        F.lit("<"), uri, F.lit("> a owl:"), ptype, F.lit(" ;\n\trdfs:label "),
        tq(label), F.lit(";\n\trdfs:comment "), tq(desc), F.lit(" .\n\n"),
    )
    return joined.where(ptype.isNotNull()).select(
        F.col("att"), block.alias("ttl")
    )


def write_ontology(
    tables: dict[str, DataFrame],
    ont_code: str,
    ns: str,
    output_dir: str,
    lat: str = "eng",
    load_on_cuis: bool = False,
    include_semantic_types: bool = True,
    umls_version: str = "2025AB",
    ordered: bool = True,
) -> None:
    """Full document export (write_into at umls2rdf.py:745-789):
    prefixes + ontology header + class blocks + property declarations
    (+ semantic types), written with ``df.write.text`` — per-partition
    streaming writes, no driver collect, so a 100 TB export writes at
    cluster width. Blocks are ordered by code (the reference emits in
    dict-insertion order, which is DB-scan order — not reproducible;
    RDF semantics are order-free).

    ``ordered=True`` (default) totally orders the document — stable
    byte-identical output, but a full range-partitioning Exchange
    purely for cosmetics. ``ordered=False`` is the scale mode: blocks
    are sorted only WITHIN partitions (no Sort Exchange at all), each
    part file is still internally tidy and the triple SET is
    identical; use it for 100 TB exports where a global sort of the
    document text would dominate the job."""
    from umls2rdf_spark.rdf.turtle import PREFIXES

    spark = tables["MRCONSO"].sparkSession
    hierarchy = ont_code != "MSH"
    tree = (
        mesh_tree(tables["MRREL"], tables["MRCONSO"])
        if ont_code == "MSH"
        else None
    )
    rec = (
        mrsab_record(tables["MRSAB"], ont_code)
        if "MRSAB" in tables
        else None
    )
    head = PREFIXES + ontology_header(rec, ont_code, ns, umls_version)
    head_df = spark.createDataFrame([("0", head)], "sort string, ttl string")
    blocks = term_blocks(
        tables, ont_code, ns, lat=lat, load_on_cuis=load_on_cuis,
        hierarchy=hierarchy, tree=tree,
    ).select(F.concat(F.lit("1:"), F.col("code")).alias("sort"), "ttl")
    parts = [head_df, blocks]
    # hasSTY ObjectProperty declaration first in the property section
    # (write_properties, umls2rdf.py:801-811): sort key "2" < "2:…".
    parts.append(
        spark.createDataFrame(
            [("2", HASSTY_PROPERTY_BLOCK)], "sort string, ttl string"
        )
    )
    if "MRDOC" in tables:
        props = used_properties(
            tables, ont_code, lat=lat, load_on_cuis=load_on_cuis,
            hierarchy=hierarchy,
        )
        parts.append(
            property_blocks(tables["MRDOC"], props, ns).select(
                F.concat(F.lit("2:"), F.col("att")).alias("sort"), "ttl"
            )
        )
    if include_semantic_types and "MRSTY" in tables:
        parts.append(
            semantic_types_lines(tables["MRSTY"], with_roots=False).select(
                F.concat(F.lit("3:"), F.col("sort_key")).alias("sort"),
                F.col("line").alias("ttl"),
            )
        )
    doc = parts[0]
    for p in parts[1:]:
        doc = doc.unionByName(p)
    assemble_document(doc, ordered).write.mode("overwrite").text(output_dir)


def assemble_document(doc: DataFrame, ordered: bool) -> DataFrame:
    """Final ordering stage of the export, factored out so plan
    audits can assert the scale mode introduces NO Sort Exchange
    (sortWithinPartitions = in-partition sort only; the ordered mode
    pays a rangepartitioning Exchange for byte-stable output)."""
    if ordered:
        doc = doc.orderBy("sort")
    else:
        doc = doc.sortWithinPartitions("sort")
    return doc.select("ttl")


def _empty_like(ref_df: DataFrame, cols: str) -> DataFrame:
    spark = ref_df.sparkSession
    return spark.createDataFrame(
        [], ", ".join(f"{c} string" for c in cols.split())
    )


def ontology_header(
    mrsab_row: dict | None,
    ont_code: str,
    ns: str,
    umls_version: str = "2025AB",
) -> str:
    """Ontology header block (ONTOLOGY_HEADER at umls2rdf.py:30,
    write_into at umls2rdf.py:750-762). MRSAB is a one-row lookup —
    driver-side string assembly, not a Spark job."""
    from umls2rdf_spark.rdf.turtle import PREFIXES  # noqa: F401

    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace('"', '\\"')

    def q(s: str) -> str:
        return f'"""{esc(s)}"""' if "\n" in s else f'"{esc(s)}"'

    row = mrsab_row or {}
    version = row.get("SVER") or umls_version
    label = row.get("SSN") or ont_code
    imeta = row.get("IMETA")
    source = f"UMLS {imeta}" if imeta else f"UMLS {umls_version}"
    alt = row.get("RSAB")
    comment = (
        f"RDF Version of the UMLS ontology {ont_code}; "
        "converted with the UMLS2RDF tool "
        "(https://github.com/ncbo/umls2rdf), "
        "developed by the NCBO project."
    )
    alt_line = f" ;\n    skos:altLabel {q(alt)}" if alt else ""
    return f"""
<{ns}>
    a owl:Ontology ;
    rdfs:comment {q(comment)} ;
    rdfs:label {q(label)} ;
    owl:imports <http://www.w3.org/2004/02/skos/core> ;
    owl:versionInfo {q(version)} ;
    dcterms:source {q(source)}{alt_line} .

"""


def mrsab_record(
    mrsab: DataFrame, ont_code: str
) -> dict | None:
    """Preferred MRSAB row: CURVER='Y' first (get_mrsab_record at
    umls2rdf.py:115-122), deterministic fallback by VSAB."""
    rows = (
        mrsab.where(F.col("RSAB") == ont_code)
        .orderBy(
            F.when(F.col("CURVER") == "Y", 0).otherwise(1), F.col("VSAB")
        )
        .limit(1)
        .collect()
    )
    return rows[0].asDict() if rows else None
