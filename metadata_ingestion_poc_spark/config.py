"""Runtime configuration for the ingestion pipeline.

Parity with the reference's Config dataclass (config.py:1-17 in
/root/reference): environment name plus the three zone base paths.
Credentials intentionally come from the environment only — the
reference's session builder referenced an undefined Azure key name
(run.py:50-54) which we do not reproduce.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Config:
    env: str
    raw_base: str
    hub_base: str
    checkpoint_base: str
    # malformed-record zone: rows a PERMISSIVE read captured in
    # `_corrupt_record` land here instead of poisoning RAW/HUB.
    # Empty string = derive `<raw_base>_quarantine`.
    quarantine_base: str = ""

    @classmethod
    def from_defaults(cls, defaults: dict, env: str = "local") -> "Config":
        raw = defaults["raw_base"]
        return cls(
            env=env,
            raw_base=raw,
            hub_base=defaults["hub_base"],
            checkpoint_base=defaults.get("checkpoint_base", ""),
            quarantine_base=defaults.get(
                "quarantine_base", f"{raw}_quarantine"
            ),
        )
