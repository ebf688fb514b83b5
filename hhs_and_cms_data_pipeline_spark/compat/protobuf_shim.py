"""Bridge ``google.protobuf`` to the pure-Python copy vendored by the
google-cloud-sdk when the real package is not installed.

Spark 4's ``transformWithStateInPandas`` Python runner lazily imports
``pyspark.sql.streaming.proto.StateMessage_pb2``
(stateful_processor_api_client.py:90 — inside a method, so ordinary
workers never need it), which requires the protobuf runtime. This
container cannot pip-install, but ships a pure-Python protobuf (4.23.2)
inside the cloud SDK at a RELOCATED import path
(``cloudsdk.google.protobuf``). ``install()`` aliases that copy into
``sys.modules`` under the canonical names.

Two deliberate, loudly-documented liberties:

- The pb2 gencode in pyspark was emitted by protoc 6.x and calls
  ``runtime_version.ValidateProtobufRuntimeVersion`` — a module the 4.x
  runtime predates. The shim registers a no-op stand-in. The version
  check exists to catch gencode/runtime descriptor-format skew; the
  StateMessage protos are plain proto3 (no editions features), the
  serialized descriptors parse under the 4.23 pure-Python runtime, and
  the transformWithState e2e test asserts the actual message round-trip
  against batch truth — the strongest validation available.
- The alias points ``google``/``google.protobuf`` at modules whose
  ``__name__`` stays ``cloudsdk...`` (submodule resolution inside the
  package must keep working); from-imports resolve through the eagerly
  seeded ``sys.modules`` entries below.

On a real cluster with protobuf installed, ``install()`` is a no-op — the
genuine package always wins.
"""

from __future__ import annotations

import importlib
import sys
import types

_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"

# submodules the pyspark pb2 gencode + api client pull in via from-imports
_EAGER = [
    "descriptor",
    "descriptor_pool",
    "descriptor_database",
    "message",
    "message_factory",
    "symbol_database",
    "text_format",
    "json_format",
    "internal",
    "internal.builder",
    "internal.api_implementation",
]


def install() -> bool:
    """Idempotently alias the vendored protobuf; True if usable.

    The availability probe imports ``google.protobuf.descriptor``, not
    just ``google.protobuf``: this machine's cloud-sdk leaves a bare
    ``google/protobuf`` DIRECTORY (no __init__) on some interpreter
    paths, which resolves as an EMPTY PEP-420 namespace package — "import
    succeeds, every symbol missing". Probing a real submodule
    distinguishes the genuine runtime from that husk, and the husk's
    sys.modules entries are evicted before aliasing."""
    try:
        from google.protobuf import descriptor  # noqa: F401  (real runtime)

        return True
    except ImportError:
        pass
    pb_mod = sys.modules.get("google.protobuf")
    if pb_mod is not None and getattr(pb_mod, "__file__", None):
        return True  # already shimmed (or a real runtime imported oddly)
    # Evict only the husks the aliases must replace: the bare ``google``
    # namespace package (no __file__) and ``google.protobuf``(.*). Real
    # sibling packages that happen to be loaded (google.auth, ...) keep
    # their sys.modules entries — their own ``google.<sub>`` keys resolve
    # first on re-import, so they survive the parent alias.
    for k in list(sys.modules):
        if k == "google.protobuf" or k.startswith("google.protobuf."):
            del sys.modules[k]
        elif k == "google" and not getattr(sys.modules[k], "__file__", None):
            del sys.modules[k]
    # Append (not insert(0)): the cloud-sdk tree also vendors six/yaml/
    # httplib2/...; prepending would shadow genuine site-packages copies
    # for every later import. ``cloudsdk`` is unique to this tree, so
    # append still resolves it. Roll back if the vendored copy is absent.
    added_path = _THIRD_PARTY not in sys.path
    if added_path:
        sys.path.append(_THIRD_PARTY)
    try:
        cloud_google = importlib.import_module("cloudsdk.google")
        pb = importlib.import_module("cloudsdk.google.protobuf")
    except ImportError:
        if added_path:
            sys.path.remove(_THIRD_PARTY)
        return False

    rv = types.ModuleType("cloudsdk.google.protobuf.runtime_version")

    class Domain:  # mirror of protobuf 5.x runtime_version.Domain
        GOOGLE_INTERNAL = 1
        PUBLIC = 2

    rv.Domain = Domain
    rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    pb.runtime_version = rv
    sys.modules["cloudsdk.google.protobuf.runtime_version"] = rv

    sys.modules["google"] = cloud_google
    # Surviving real siblings (google.auth, ...) stay importable via their
    # own sys.modules keys, but `import google.auth` followed by
    # `google.auth.x` resolves the attribute on the NEW parent module —
    # re-attach each sibling so attribute-style access keeps working.
    for k, m in list(sys.modules.items()):
        if k.startswith("google.") and "." not in k[len("google."):]:
            setattr(cloud_google, k[len("google."):], m)
    sys.modules["google.protobuf"] = pb
    sys.modules["google.protobuf.runtime_version"] = rv
    for sub in _EAGER:
        try:
            m = importlib.import_module(f"cloudsdk.google.protobuf.{sub}")
        except ImportError:
            continue
        sys.modules[f"google.protobuf.{sub}"] = m
    return True
