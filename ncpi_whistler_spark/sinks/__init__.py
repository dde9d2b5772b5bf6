"""Sinks: the only place effects leave Spark (SURVEY.md §2.8).

``bundle``    — chunked FHIR transaction-bundle files (S9).
``idresolve`` — identifier→id map + reference-resolution fixpoint (J4/E2).
``rest``      — partitioned REST loader behind an injectable transport
                (S10/E3–E6); tests run it against an in-memory fake.
"""
