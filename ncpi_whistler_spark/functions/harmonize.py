"""Whistle Harmonize* function family as native Column combinators.

In the reference every value lookup is ``$HarmonizeCode("$Local", code,
system, "data-harmony")`` (wstlr/wlib/core/_harmonize.wstl:7-9) — a per-value
dictionary probe into the ConceptMap, returning ALL target codings for
(code, source-system) including a ``self`` entry carrying the original text.
The wlib wraps that probe with filters/selectors (H1–H7 in SURVEY.md §2.6).

Here the probe is a broadcast equi-join performed once per column
(operators/harmonize.py) producing an ``array<struct<code,display,system>>``
column; the wrappers below are higher-order-function expressions over that
array — pure JVM, whole-stage-codegen friendly, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: system value the self-coding carries (reference: wstlr/conceptmap.py
#: writes the local text under the 'self' group, wstlr/conceptmap.py:445-447)
SELF_SYSTEM = "self"
#: systems suffixed like this are excluded from "mapped" results
#: (reference: wstlr/wlib/core/_non_self_harmony.wstl:7-11)
UNHARMONIZED_SUFFIX = "-unharmonized"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- H1 is the join itself (operators/harmonize.py: harmonize()) -----------


def harmonize_mapped(codings: Column | str) -> Column:
    """H2 ``HarmonizeMapped`` — all codings except ``self`` and
    ``*-unharmonized`` systems (_harmonize_mapped.wstl:7-10)."""
    return F.filter(
        _c(codings),
        lambda x: (x["system"] != SELF_SYSTEM)
        & (~x["system"].endswith(UNHARMONIZED_SUFFIX)),
    )


def harmonize_mapped_first(codings: Column | str) -> Column:
    """H3 ``HarmonizeMappedFirst`` — first external coding
    (_harmonize_mapped_first.wstl:7-10). NULL struct when unmapped."""
    filtered = harmonize_mapped(codings)
    return F.try_element_at(filtered, F.lit(1))


def harmonize_as_code(codings: Column | str) -> Column:
    """H4 ``HarmonizeAsCode`` — first external coding's code
    (_harmonize_as_code.wstl:8-11)."""
    return harmonize_mapped_first(codings)["code"]


def harmonize_as_coding(codings: Column | str) -> Column:
    """H5 ``HarmonizeAsCoding`` — ``{coding: [...filtered...]}`` struct
    (_harmonize_as_coding.wstl:8-10)."""
    return F.struct(harmonize_mapped(codings).alias("coding"))


def self_only(codings: Column | str) -> Column:
    """H6 ``SelfOnly`` — the self coding struct (_self_only.wstl:7-11)."""
    return F.try_element_at(
        F.filter(_c(codings), lambda x: x["system"] == SELF_SYSTEM), F.lit(1)
    )


def harmonized_local_display(codings: Column | str) -> Column:
    """H6 ``HarmonizedLocalDisplay`` — the self coding's display, i.e.
    code → original text (_harmonized_local_display.wstl:8-12)."""
    return self_only(codings)["display"]


def harmonize_select_by_prefix(codings: Column | str, prefix: str) -> Column:
    """H7 ``HarmonizeSelectByPrefix`` — codings whose system starts with
    prefix (_harmonize_select_by_prefix.wstl:2-5)."""
    return F.filter(_c(codings), lambda x: x["system"].startswith(prefix))


def harmonize_with_filter(codings: Column | str, system_regex: str) -> Column:
    """H7 ``HarmonizeWithFilter`` — codings whose system matches a regex
    (_harmonize_with_filter.wstl:3-6)."""
    return F.filter(_c(codings), lambda x: x["system"].rlike(system_regex))


# -- literal builders (H8–H13) ---------------------------------------------


def build_coding(
    code: Column | str, display: Column | str | None = None,
    system: Column | str | None = None,
) -> Column:
    """H8 ``BuildCoding`` (_build_coding.wstl:8-12) — optional fields kept
    as NULLs (serialization drops them, matching whistle nil-pruning)."""
    fields = [_c(code).alias("code")]
    fields.append((_c(display) if display is not None else F.lit(None).cast("string")).alias("display"))
    fields.append((_c(system) if system is not None else F.lit(None).cast("string")).alias("system"))
    return F.struct(*fields)


def key_identifier(value: Column | str, prefix: str, resource_type: str) -> Column:
    """H9 ``Key_Identifier`` — ``{value, system: prefix+'/'+lower(type)}``
    (_key_identifier.wstl:13-16)."""
    return F.struct(
        _c(value).cast("string").alias("value"),
        F.lit(f"{prefix}/{resource_type.lower()}").alias("system"),
    )


def reference_key_identifier(value: Column | str, prefix: str, resource_type: str) -> Column:
    """H9 ``Reference_Key_Identifier`` — H9 wrapped in ``{identifier: ...}``
    (_reference_key_identifier.wstl:11-13)."""
    return F.struct(key_identifier(value, prefix, resource_type).alias("identifier"))


def study_meta(study_id: str, system: str = "https://ncpi-fhir.github.io/fhir-study-metadata") -> Column:
    """H10 ``StudyMeta`` — study tag coding for meta.tag[]
    (_study_meta.wstl:5-9)."""
    return F.struct(F.lit(system).alias("system"), F.lit(study_id).alias("code"))


def string_replace(col: Column | str, old: str, new: str) -> Column:
    """H11 ``StringReplace`` — split/join replacement
    (_replace_in_string.wstl:4-7)."""
    return F.replace(_c(col), F.lit(old), F.lit(new))


def convert_for_valueset_url(col: Column | str) -> Column:
    """H12 ``ConvertForValueSetURL`` (_convert_for_valueset_url.wstl:4-6)."""
    return string_replace(col, "/CodeSystem/", "/ValueSet/")


def dotted_id(*parts: Column | str) -> Column:
    """H13 ``BuildVariableTerminologyId``-style dotted id concat
    (_build_terminology_id.wstl:8-19)."""
    return F.concat_ws(".", *[_c(p) for p in parts])


def race_extension(
    codings: Column | str,
    raw_value: Column | str,
    missing: tuple[str, ...] = ("NA", "", "Not Provided"),
    url: str = "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race",
) -> Column:
    """H15 ``RaceExtension`` (_race_extension.wstl:21-37): NA-guarded;
    first mapped coding becomes ombCategory, raw text always carried;
    falls back to text-only when unharmonized."""
    raw = _c(raw_value)
    first = harmonize_mapped_first(codings)
    ext = F.struct(
        F.lit(url).alias("url"),
        F.when(first.isNotNull(), first).alias("ombCategory"),
        raw.alias("text"),
    )
    return F.when(raw.isNotNull() & ~raw.isin(*missing), ext)


def ethnicity_extension(
    codings: Column | str,
    raw_value: Column | str,
    missing: tuple[str, ...] = ("NA", "", "Not Provided"),
    url: str = "http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity",
) -> Column:
    """H15 ``EthnicityExtension`` (_ethnicty_extension.wstl:22-45) —
    same guard/fallback shape as race."""
    return race_extension(codings, raw_value, missing, url)


def extract_official_identifier(
    identifiers: Column | str, prefix_regex: str, has_use_field: bool = False
) -> Column:
    """E1 identifier extraction (wstlr/load.py:152-175): first identifier
    whose system matches the prefix regex, else the use='official' one
    (when the struct carries a ``use`` field), else the first."""
    ids = _c(identifiers)
    candidates = [
        F.try_element_at(F.filter(ids, lambda x: x["system"].rlike(prefix_regex)), F.lit(1))
    ]
    if has_use_field:
        candidates.append(
            F.try_element_at(
                F.filter(ids, lambda x: x["use"] == "official"), F.lit(1)
            )
        )
    candidates.append(F.try_element_at(ids, F.lit(1)))
    return F.coalesce(*candidates)


def age_at_extension(age: Column | str, unit: str = "years",
                     url: str = "http://hl7.org/fhir/StructureDefinition/cqf-relativeDateTime") -> Column:
    """H14 ``AgeAtExtension`` — numeric age → relative-datetime extension
    struct (_age_at_extension.wstl:13-48); non-numeric ages yield NULL via
    the try_cast guard (reference guards with ``$Type(value)='number'``)."""
    qty = _c(age).try_cast("double")
    return F.when(
        qty.isNotNull(),
        F.struct(
            F.lit(url).alias("url"),
            F.struct(
                qty.alias("value"),
                F.lit(unit).alias("unit"),
            ).alias("valueQuantity"),
        ),
    )
