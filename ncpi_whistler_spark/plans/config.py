"""Study configuration model (the whistler YAML dialect).

Mirrors the reference's Configuration surface (wstlr/config.py:18-207,
docs/ref/project_config.md) as typed dataclasses: study metadata, curies,
active-table selection, and per-table dataflow directives (embed /
group_by / aggregators / key_columns / code_harmonization / DD binding).

The config is pure plan input — parsing it never touches data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class EmbedConfig:
    """embed: {dataset: <target table>, colname: <join col(s), comma-sep>}
    (docs/ref/project_config.md:79-96)."""

    dataset: str
    colname: str


@dataclass
class DdConfig:
    """data_dictionary: {filename, colnames: {canonical: actual}}
    (docs/ref/project_config.md:62-76)."""

    filename: str | None = None
    colnames: dict[str, str] = field(default_factory=dict)


@dataclass
class TableConfig:
    name: str
    filename: str = ""
    delimiter: str = ","
    embed: EmbedConfig | None = None
    group_by: str | None = None
    subject_id: str | None = None
    key_columns: str | None = None
    aggregators: dict[str, str] = field(default_factory=dict)
    aggregator_splitter: str | None = None
    code_harmonization: str | None = None
    data_dictionary: DdConfig | None = None

    @classmethod
    def from_dict(cls, name: str, d: dict[str, Any]) -> "TableConfig":
        embed = None
        if d.get("embed"):
            embed = EmbedConfig(
                dataset=d["embed"]["dataset"], colname=d["embed"]["colname"]
            )
        dd = None
        if d.get("data_dictionary"):
            dd = DdConfig(
                filename=d["data_dictionary"].get("filename"),
                colnames=d["data_dictionary"].get("colnames", {}) or {},
            )
        return cls(
            name=name,
            filename=d.get("filename", ""),
            delimiter=d.get("delimiter", ","),
            embed=embed,
            group_by=d.get("group_by"),
            subject_id=d.get("subject_id"),
            key_columns=d.get("key_columns"),
            aggregators=d.get("aggregators", {}) or {},
            aggregator_splitter=d.get("aggregator-splitter") or d.get("aggregator_splitter"),
            code_harmonization=d.get("code_harmonization"),
            data_dictionary=dd,
        )


@dataclass
class StudyConfig:
    study_id: str
    study_title: str = ""
    study_desc: str = ""
    study_accession: str = ""
    url: str = ""
    publisher: str = ""
    annotations: dict = field(default_factory=dict)
    identifier_prefix: str = ""
    dd_prefix: str | None = None
    id_colname: str | None = None
    output_filename: str | None = None
    #: stamp ncpi-fhir-ig meta.profile on DD resources — reference default
    #: is ON (wstlr/init.py:92-113, --no-profiles to disable)
    profiles: bool = True
    curies: dict[str, str] = field(default_factory=dict)
    active_tables: dict[str, bool] = field(default_factory=dict)
    missing_values: list[str] = field(default_factory=lambda: ["NA", "", "Not Provided"])
    dataset: dict[str, TableConfig] = field(default_factory=dict)
    #: optional study blocks passed through to the whistle-input document
    #: (wstlr/config.py:190-199 + extractor.py:229-246): sponsor string,
    #: {access_type, access_url}, {code, ...} consent group
    study_sponsor: str | None = None
    remote_data_access: dict | None = None
    consent_group: dict | None = None
    #: user-authored projector plugin point (wstlr/config.py:134-151
    #: whistle_src/projector_lib) — here Python files whose build_*
    #: functions emit extra resource frames (plans/projectors.py)
    whistle_src: str | None = None
    projector_lib: str | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "StudyConfig":
        tables = {
            name: TableConfig.from_dict(name, tbl or {})
            for name, tbl in (d.get("dataset") or {}).items()
        }
        missing = ["NA", "", "Not Provided"]
        if d.get("config", {}).get("missing"):
            raw = d["config"]["missing"]
            missing = raw.split(",") if isinstance(raw, str) else list(raw)
        return cls(
            study_id=d["study_id"],
            study_title=d.get("study_title", ""),
            study_desc=d.get("study_desc", ""),
            study_accession=d.get("study_accession", ""),
            url=d.get("url", ""),
            publisher=d.get("publisher", ""),
            annotations=d.get("annotations", {}) or {},
            identifier_prefix=d.get("identifier_prefix", ""),
            dd_prefix=d.get("dd_prefix"),
            id_colname=d.get("id_colname"),
            output_filename=d.get("output_filename"),
            profiles=bool(d.get("profiles", True)),
            curies=d.get("curies", {}) or {},
            active_tables=d.get("active_tables", {}) or {},
            missing_values=missing,
            dataset=tables,
            study_sponsor=d.get("study_sponsor"),
            remote_data_access=d.get("remote_data_access"),
            consent_group=d.get("consent_group"),
            whistle_src=d.get("whistle_src"),
            projector_lib=d.get("projector_lib"),
        )

    @classmethod
    def from_yaml(cls, path: str) -> "StudyConfig":
        with open(path) as fh:
            return cls.from_dict(yaml.safe_load(fh))

    def is_active(self, table_name: str) -> bool:
        """active_tables pruning (P3, wstlr/extractor.py:251-253): ALL
        flag or per-table flag; default active when unconfigured."""
        if not self.active_tables:
            return True
        if self.active_tables.get("ALL"):
            return True
        return bool(self.active_tables.get(table_name, False))

    def harmony_files(self) -> list[str]:
        return sorted(
            {
                t.code_harmonization
                for t in self.dataset.values()
                if t.code_harmonization
            }
        )
