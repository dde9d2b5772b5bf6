"""User-authored projector plugin point.

The reference lets every study ship its own Whistle transform library:
``whistle_src`` names the study's entry mapping file and
``projector_lib`` a directory of supporting projectors
(wstlr/config.py:134-151), both handed to the whistle binary at play
time (wstlr/play.py:46-76).  This engine deliberately drops the Whistle
toolchain, so the analog is a *Python* plugin point: the same two config
keys now name Python files whose top-level ``build_*`` functions (or an
explicit ``register(registry)`` hook) produce extra resource frames that
merge into the play pipeline exactly where whistle output would.

Contract for a user builder::

    def build_my_resource(spark, dataset, study):
        # dataset: plans.pipeline.ExtractedDataset (tables/dds/concept_map)
        # study:   plans.config.StudyConfig
        return df    # either typed rows (module, resourceType, ...fields)
                     # or serialized rows (module, resourceType, resource_json)

Typed frames are serialized through :func:`resources_to_json` (nulls
dropped, matching whistle's nil-elision); already-serialized frames pass
through untouched.  Builders run on the driver to *declare* plans only —
the returned DataFrames stay lazy, so a custom projector scales exactly
like the built-in ones.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

__all__ = [
    "ProjectorRegistry",
    "load_projector_lib",
    "run_projectors",
]

#: columns of a serialized resource frame (the play pipeline currency)
_SERIALIZED_COLS = {"module", "resourceType", "resource_json"}


@dataclass
class ProjectorRegistry:
    """Named user builder functions, insertion-ordered.

    The reference's whistle library has no explicit registry — every
    ``def X(...)`` projector in ``projector_lib`` is callable from the
    study's entry file.  Here the registry makes the loaded surface
    inspectable (``play`` prints which custom projectors ran).
    """

    builders: dict[str, Callable] = field(default_factory=dict)

    def add(self, name: str, fn: Callable) -> None:
        if name in self.builders:
            raise ValueError(f"duplicate projector name: {name!r}")
        self.builders[name] = fn

    def names(self) -> list[str]:
        return list(self.builders)

    def __len__(self) -> int:  # pragma: no cover - trivial
        return len(self.builders)


def _load_module(path: str):
    """Import a user Python file without requiring it on sys.path.

    Mirrors how whistle consumes projector files by path, not package
    (wstlr/play.py:46-60: ``-lib_dir_spec`` + ``-mapping_file_spec``).
    Each file gets a unique module name so two studies' ``projector.py``
    files don't collide in ``sys.modules``.
    """
    modname = f"_whistler_projector_{abs(hash(os.path.abspath(path))):x}"
    spec = importlib.util.spec_from_file_location(modname, path)
    if spec is None or spec.loader is None:
        raise ImportError(f"cannot load projector file: {path}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def _register_from_module(mod, registry: ProjectorRegistry) -> None:
    """Auto-register ``build_*`` functions; honor an explicit
    ``register(registry)`` hook when the file defines one."""
    hook = getattr(mod, "register", None)
    if callable(hook):
        hook(registry)
        return
    for name in sorted(vars(mod)):
        fn = getattr(mod, name)
        if name.startswith("build_") and callable(fn):
            registry.add(name, fn)


def load_projector_lib(study) -> ProjectorRegistry:
    """Load the study's custom projectors per its config.

    ``whistle_src`` — one Python file (the reference's entry mapping,
    wstlr/config.py:134-135); ``projector_lib`` — a directory whose
    ``*.py`` files all load, sorted by name for determinism (the
    reference passes the whole dir to whistle's ``-lib_dir_spec``).
    Either may be absent; missing *configured* paths raise, matching the
    reference's die_if on missing study inputs (wstlr/play.py:83-86).
    """
    registry = ProjectorRegistry()
    src = getattr(study, "whistle_src", None)
    lib = getattr(study, "projector_lib", None)
    if src:
        if not os.path.isfile(src):
            raise FileNotFoundError(f"whistle_src not found: {src}")
        _register_from_module(_load_module(src), registry)
    if lib:
        if not os.path.isdir(lib):
            raise FileNotFoundError(f"projector_lib not found: {lib}")
        for fname in sorted(os.listdir(lib)):
            if fname.endswith(".py") and not fname.startswith("_"):
                _register_from_module(_load_module(os.path.join(lib, fname)), registry)
    return registry


def run_projectors(spark, registry: ProjectorRegistry, dataset, study) -> list[DataFrame]:
    """Invoke every registered builder and normalize outputs to the
    serialized (module, resourceType, resource_json) currency.

    A builder returning ``None`` is skipped (conditional projectors —
    e.g. only emit when a table is active).  Anything else must be a
    DataFrame carrying at least module + resourceType.
    """
    from ncpi_whistler_spark.plans.resources import resources_to_json

    frames: list[DataFrame] = []
    for name, fn in registry.builders.items():
        df = fn(spark, dataset, study)
        if df is None:
            continue
        if not isinstance(df, DataFrame):
            raise TypeError(f"projector {name!r} returned {type(df).__name__}, "
                            "expected DataFrame or None")
        cols = set(df.columns)
        if not {"module", "resourceType"} <= cols:
            raise ValueError(
                f"projector {name!r} frame lacks module/resourceType columns: "
                f"{sorted(cols)}"
            )
        if cols == _SERIALIZED_COLS:
            frames.append(df.select("module", "resourceType", "resource_json"))
        else:
            frames.append(resources_to_json(df))
    return frames
