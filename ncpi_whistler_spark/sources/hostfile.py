"""Named-FHIR-host resolution from a ``fhir_hosts`` config file.

Mirrors the reference's host alias contract (wstlr/hostfile.py:1-64): a
YAML file in the working directory maps a host *name* to its connection
config (``host_desc`` / ``target_service_url`` / ``auth_type`` + auth
fields), so CLI commands take ``--host dev`` instead of a raw URL. A
missing or empty file prints an example configuration to stdout, an error
pointer to stderr, and exits 1 (tested behavior: reference
tests/test_hostfile.py:7-42).

The reference enumerates auth modules from its FHIR-client package; this
engine ships transport-agnostic sinks (sinks/rest.py takes an injectable
transport), so the example block lists the common public auth shapes
instead.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Any, TextIO

try:  # optional dep; the fallback parser below covers the flat hosts shape
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

_default_hosts_file = "fhir_hosts"

#: public auth shapes for the example block (the reference derives these
#: from its auth-module registry; same keys users see in its output)
_EXAMPLE_AUTHS = {
    "auth_basic": {"username": "someuser", "password": "somepassword"},
    "auth_bearer": {"token": "sometoken"},
    "no_auth": {},
}


def example_config(writer: TextIO, auth_type: str | None = None) -> None:
    """Write a commented example hosts configuration covering each auth
    shape (or just ``auth_type``)."""
    print(
        """# Example Hosts Configuration.
#
# This is a basic yaml file (yaml.org) where each root level tag represents a
# system "name" and it's children's keys represent key/values to assign to a
# host configuration which includes the authentication details.
#
# All host entries should have the following key/values:
# host_desc             - This is just a short description which can be used
#                         for log names or whatnot
# target_service_url    - This is the URL associated with the actual API
# auth_type             - This is the module name for the authentication used
#                         by the specified host
#
# Please note that there can be multiple hosts that use the same authentication
# mechanism. Users must ensure that each host has a unique "key" """,
        file=writer,
    )
    for key, fields in _EXAMPLE_AUTHS.items():
        if auth_type is None or auth_type == key:
            print(f"example_{key}:", file=writer)
            print(f"  host_desc: Example {key}", file=writer)
            print("  target_service_url: https://example.fhir.server/R4/fhir", file=writer)
            print(f"  auth_type: {key}", file=writer)
            for fk, fv in fields.items():
                print(f"  {fk}: {fv}", file=writer)


def _parse_flat_yaml(text: str) -> dict[str, Any]:
    """Minimal two-level YAML subset parser (hosts files are flat maps of
    maps) — used only when PyYAML is unavailable."""
    out: dict[str, Any] = {}
    current: dict[str, Any] | None = None
    for line in text.splitlines():
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        if not line.startswith(" "):
            name = line.split(":", 1)[0].strip()
            current = {}
            out[name] = current
        elif current is not None and ":" in line:
            k, v = line.strip().split(":", 1)
            current[k.strip()] = v.strip().strip("'\"")
    return out


def load_hosts_file(
    filename: str | os.PathLike[str] | None = None,
) -> dict[str, Any]:
    """Load the hosts config; on a missing/empty file, print the example
    config to stdout, a pointer to stderr, and exit 1 — byte-compatible
    exit behavior with the reference (wstlr/hostfile.py:47-64)."""
    if filename is None:
        filename = _default_hosts_file
    host_config_filename = Path(filename)

    if (
        not host_config_filename.is_file()
        or host_config_filename.stat().st_size == 0
    ):
        example_config(sys.stdout)
        sys.stderr.write(
            """
A valid host configuration file, fhir_hosts, must exist in cwd and was not
found. Example configuration has been written to stout providing examples
for each of the auth types currently supported.\n"""
        )
        sys.exit(1)

    text = host_config_filename.read_text()
    if yaml is not None:
        return yaml.safe_load(text)
    return _parse_flat_yaml(text)


def resolve_host(
    name: str, filename: str | os.PathLike[str] | None = None
) -> dict[str, Any]:
    """Config block for one named host; KeyError lists known names."""
    hosts = load_hosts_file(filename)
    if name not in hosts:
        raise KeyError(
            f"host {name!r} not in hosts file (known: {sorted(hosts)})"
        )
    return hosts[name]
