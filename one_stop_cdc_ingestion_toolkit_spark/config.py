"""Config-value indirection: never store plaintext secrets in specs.

The reference injects secrets via ``${secretsmanager:<name>:<key>}``
placeholders resolved by a config provider at runtime
(`/root/reference/bin/mskc-connector.sh:401,405`; provider wiring
`bin/mskc-worker.sh:58-64`). The engine keeps the same contract with two
providers (no AWS in scope):

- ``${env:VAR}``           → environment variable
- ``${file:/path:key}``    → key in a JSON credentials file

Unresolvable placeholders raise — a spec must never silently run with a
literal placeholder as a password.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

_PLACEHOLDER = re.compile(r"\$\{(env|file):([^}:]+)(?::([^}]+))?\}")
#: any provider-shaped placeholder — matched against the TEMPLATE with
#: the supported-placeholder spans removed (ADVICE r8: matching the
#: substituted OUTPUT falsely rejected a legitimately resolved secret
#: whose VALUE contains ``${word:...}`` text, e.g. a password from a
#: credentials file or a log4j-style pattern). It catches providers this
#: engine does not implement (e.g. the reference's
#: ``${secretsmanager:...}``): the module contract says unresolvable
#: placeholders RAISE, and an unknown provider passing through as
#: literal text was exactly the silent-password failure the contract
#: forbids (review r7)
_ANY_PLACEHOLDER = re.compile(r"\$\{\w+:[^}]*\}")


class UnresolvedSecretError(Exception):
    pass


def resolve_value(value: str) -> str:
    """Resolve every placeholder inside a string value."""

    def _sub(m: re.Match) -> str:
        provider, name, key = m.group(1), m.group(2), m.group(3)
        if provider == "env":
            if name not in os.environ:
                raise UnresolvedSecretError(f"environment variable not set: {name}")
            return os.environ[name]
        doc = json.loads(Path(name).read_text())
        if key is None or key not in doc:
            raise UnresolvedSecretError(f"key {key!r} not in credentials file {name}")
        return str(doc[key])

    # unknown-provider check runs on the UNSUBSTITUTED spans of the
    # original template, never on resolved secret values (ADVICE r8).
    # Supported spans are replaced by a SPACE, not deleted (review r8):
    # deletion could splice surrounding literal text into a
    # placeholder-shaped span ('${foo' + '${env:A}' + ':bar}' would
    # fuse into '${foo:bar}' and raise on a valid template); the space
    # breaks the \w+: adjacency so no false span can form.
    leftover = _ANY_PLACEHOLDER.search(_PLACEHOLDER.sub(" ", value))
    if leftover:
        raise UnresolvedSecretError(
            f"unsupported secret provider in {leftover.group(0)!r} — "
            "this engine resolves ${env:...} and ${file:...:...}"
        )
    return _PLACEHOLDER.sub(_sub, value)


def resolve_options(options: dict) -> dict:
    """Resolve all string values of an options mapping (e.g. the Kafka
    client options passed through ``sources.kafka.kafka_reader``)."""
    return {
        k: resolve_value(v) if isinstance(v, str) else v for k, v in options.items()
    }
