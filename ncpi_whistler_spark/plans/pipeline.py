"""Extraction pipeline: compile a StudyConfig into the dataset DAG.

Reference flow (wstlr/extractor.py:207-373 ``DataCsvToObject``): load embed
tables first, then per active table apply — header normalization →
DD-driven rename → aggregator pivot → display columns → (group_by | embed
probe) → collect into the whistle-input JSON document.

Here each stage is a DataFrame transformation; nothing materializes until
a sink runs. The returned ``ExtractedDataset`` carries the table
DataFrames plus the harmony ConceptMap and DD objects — the inputs the
resource builders (plans/resources.py) consume directly, replacing the
whistle-subprocess JSON round-trip.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType as _ArrayType

from ncpi_whistler_spark.operators.aggregators import aggregate_columns
from ncpi_whistler_spark.operators.harmonize import add_display_columns
from ncpi_whistler_spark.operators.nest import embed, group_to_nested
from ncpi_whistler_spark.plans.config import StudyConfig, TableConfig
from ncpi_whistler_spark.sources.csv_source import scan_csv
from ncpi_whistler_spark.sources.dd import DataDictionary
from ncpi_whistler_spark.sources.harmony import ConceptMap

#: row-order column threaded through order-observable operators
ROW_ID = "_row_id"


@dataclass
class ExtractedDataset:
    """The engine's whistle-input analog: a catalog of lazy DataFrames +
    plan metadata (no JSON materialization between stages)."""

    config: StudyConfig
    tables: dict[str, DataFrame] = field(default_factory=dict)
    dds: dict[str, DataDictionary] = field(default_factory=dict)
    concept_map: ConceptMap | None = None

    def missing_filtered(self, name: str, columns: list[str]) -> DataFrame:
        """P7: null out configured missing-vocabulary values in the given
        columns (reference filters per-value in whistle guards)."""
        df = self.tables[name]
        for c in columns:
            df = df.withColumn(
                c,
                F.when(F.col(c).isin(*self.config.missing_values), None).otherwise(
                    F.col(c)
                ),
            )
        return df


def _base_scan(spark: SparkSession, tbl: TableConfig, keep_order: bool) -> DataFrame:
    df = scan_csv(
        spark, tbl.filename, delimiter=tbl.delimiter, row_id=ROW_ID if keep_order else None
    )
    return df


def extract_table(
    spark: SparkSession,
    config: StudyConfig,
    tbl: TableConfig,
    concept_map: ConceptMap | None,
    dd: DataDictionary | None,
    embeds: dict[str, list[tuple[str, DataFrame, str]]],
    keep_order: bool = True,
) -> DataFrame:
    """One table's plan: scan → rename (P1) → aggregators (A2) → display
    cols (P2) → group_by (A1) | embed probe (J1)."""
    df = _base_scan(spark, tbl, keep_order)

    if dd is not None:
        rename = dd.rename_map()
        df = df.toDF(*[rename.get(c, c) for c in df.columns])

    code_details: dict[str, str] = {}
    if tbl.code_harmonization:
        from ncpi_whistler_spark.sources.harmony import read_code_details

        code_details = read_code_details(tbl.code_harmonization)

    if tbl.aggregators:
        code_rename = dd.rename_map() if dd else None
        df = aggregate_columns(
            df,
            tbl.aggregators,
            splitter=tbl.aggregator_splitter,
            code_rename=code_rename,
            code_details=code_details,
        )

    if code_details:
        # reference-exact: every standard column whose value matches a
        # harmony local code gains <col>_display (global value-keyed map)
        display_cols = [
            c
            for c in df.columns
            if c != ROW_ID and not isinstance(df.schema[c].dataType, _ArrayType)
        ]
        df = add_display_columns(df, display_cols, code_details)

    if tbl.group_by:
        df = group_to_nested(df, tbl.group_by, order_by=ROW_ID if keep_order else None)
    elif ROW_ID in df.columns:
        df = df.drop(ROW_ID)

    for child_name, child_df, colname in embeds.get(tbl.name, []):
        df = embed(df, child_df, colname, child_name, keep_keys=True)

    return df


def extract_dataset(
    spark: SparkSession, config: StudyConfig, keep_order: bool = True
) -> ExtractedDataset:
    """Full extraction DAG for a study (the ``extractjson`` entry point,
    wstlr/extractor.py:376-399 — but lazy end to end)."""
    out = ExtractedDataset(config=config)

    # harmony ConceptMap (built once, broadcast everywhere)
    harmony = config.harmony_files()
    if harmony:
        out.concept_map = ConceptMap.from_csv(spark, harmony, curies=config.curies)

    # DDs parse driver-side (plan metadata)
    for name, tbl in config.dataset.items():
        if tbl.data_dictionary and tbl.data_dictionary.filename:
            out.dds[name] = DataDictionary.from_csv(
                spark, tbl.data_dictionary.filename, name
            )

    # embed tables load first (wstlr/extractor.py:257-266): child scan +
    # rename, keyed for the probe
    embeds: dict[str, list[tuple[str, DataFrame, str]]] = {}
    for name, tbl in config.dataset.items():
        if tbl.embed is not None:
            child = _base_scan(spark, tbl, keep_order=False)
            dd = out.dds.get(name)
            if dd:
                rename = dd.rename_map()
                child = child.toDF(*[rename.get(c, c) for c in child.columns])
            embeds.setdefault(tbl.embed.dataset, []).append(
                (name, child, tbl.embed.colname)
            )

    for name, tbl in config.dataset.items():
        if tbl.embed is not None:
            continue  # embedded tables surface inside their parents
        if not config.is_active(name):
            continue  # P3 pruning — the plan is never built
        out.tables[name] = extract_table(
            spark, config, tbl, out.concept_map, out.dds.get(name), embeds, keep_order
        )
    return out


#: whistle-input materialization is a driver-side collect by design (the
#: reference's inter-stage document IS a single JSON file); cap it so a
#: misuse on a big table fails loudly instead of OOMing the driver.
MAX_WHISTLE_INPUT_ROWS = 100_000


def to_whistle_input(dataset: ExtractedDataset, max_rows: int | None = MAX_WHISTLE_INPUT_ROWS) -> dict:
    """Materialize the reference's whistle-input JSON document shape
    (wstlr/extractor.py:207-224) — golden-output parity/debug only; the
    engine itself never needs this collect.

    Each table is capped at ``max_rows`` (pass ``None`` to disable for
    golden-output tests); an over-cap table raises rather than silently
    pulling an unbounded corpus onto the driver."""
    from ncpi_whistler_spark.functions.core import dd_system_url

    cfg = dataset.config
    dd_prefix = cfg.dd_prefix or cfg.identifier_prefix
    doc: dict = {
        "config": {"missing": cfg.missing_values},
        "study": {
            "id": cfg.study_id,
            "accession": cfg.study_accession,
            "title": cfg.study_title,
            "desc": cfg.study_desc,
            "identifier-prefix": cfg.identifier_prefix,
            "dd-prefix": dd_prefix,
            "url": cfg.url,
            # reference default (wstlr/extractor.py:244-245)
            "publisher": cfg.publisher or "NCPI FHIR Working Group",
            "data-dictionary": [{"study": cfg.study_id, "values": []}],
            "annotations": cfg.annotations,
        },
        "code-systems": [],
        "harmony": [],
    }
    # optional study blocks (wstlr/extractor.py:229-246): remote access,
    # sponsor, consent group (whose code scopes harmony system urls)
    if cfg.remote_data_access is not None:
        doc["study"]["remote_access"] = {
            "type": cfg.remote_data_access["access_type"],
            "url": cfg.remote_data_access["access_url"],
        }
    if cfg.study_sponsor is not None:
        doc["study"]["sponsor"] = cfg.study_sponsor
    consent_code = None
    if cfg.consent_group is not None:
        doc["study"]["consent_group"] = cfg.consent_group
        doc["study"]["consent_code"] = cfg.consent_group["code"]
        consent_code = cfg.consent_group["code"]
    # study-level DataSet DD + code system, then per-table DD/CS entries in
    # config order — the reference's document skeleton
    # (wstlr/extractor.py:247-331: obj_as_dd/obj_as_cs, table_as_dd,
    # table_as_cs, variables_as_cs).
    study_url = dd_system_url(dd_prefix, "CodeSystem", None, "DataSet", None)
    doc["study"]["data-dictionary"][0] = {
        "url": study_url,
        "study": cfg.study_id,
        "table_name": "DataSet",
        "values": [
            dd.as_study_member_entry(dd_prefix) for dd in dataset.dds.values()
        ],
    }
    doc["code-systems"].append(
        {
            "url": study_url,
            "study": cfg.study_id,
            "table_name": "DataSet",
            "values": [
                {"code": name, "description": dd.table_desc()}
                for name, dd in dataset.dds.items()
            ],
        }
    )
    for name in cfg.dataset:
        dd = dataset.dds.get(name)
        if dd is None:
            continue
        doc["study"]["data-dictionary"].append(dd.as_dd_table(dd_prefix))
        doc["code-systems"].append(dd.as_table_cs(cfg.study_id, dd_prefix))
        doc["code-systems"].extend(dd.variables_as_cs(cfg.study_id, dd_prefix))
    # harmony: one nested object per distinct harmony file, first-seen
    # config order, gated on ALL/harmony activity (wstlr/extractor.py:
    # 299-310) — reference document shape via whistle_harmony_obj.
    if cfg.active_tables.get("ALL") or cfg.active_tables.get("harmony") or not cfg.active_tables:
        from ncpi_whistler_spark.sources.harmony import whistle_harmony_obj

        seen_harmony: set[str] = set()
        for tbl in cfg.dataset.values():
            hf = tbl.code_harmonization
            if hf and hf not in seen_harmony:
                seen_harmony.add(hf)
                doc["harmony"].append(
                    whistle_harmony_obj(
                        hf, curies=cfg.curies, consent_group=consent_code
                    )
                )
    for name, df in dataset.tables.items():
        if max_rows is not None:
            rows = df.limit(max_rows + 1).collect()
            if len(rows) > max_rows:
                raise ValueError(
                    f"to_whistle_input: table {name!r} exceeds the "
                    f"{max_rows}-row driver-collect cap; this path exists "
                    "for golden-output parity/debug only — use the "
                    "DataFrame pipeline (or pass max_rows=None if you "
                    "really want an unbounded driver collect)"
                )
        else:
            rows = df.collect()
        doc[name] = [_row_to_plain(r) for r in rows]
    return doc


def _row_to_plain(row):
    d = row.asDict(recursive=True)
    return d
