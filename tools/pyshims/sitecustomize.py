"""Opt-in interpreter shim for transformWithStateInPandas experiments.

PySpark 4.1's transformWithState Python workers speak the state-server
protocol through generated protobuf stubs (gencode 6.33).  This
container has no installed ``protobuf`` package, but the Google Cloud
SDK ships a complete pure-Python protobuf runtime at
``/usr/lib/google-cloud-sdk/platform/google_appengine`` — version
6.32, which refuses to load 6.33 gencode purely on its version gate
(one minor version apart, same major: the serialized-descriptor wire
format is identical).  This sitecustomize relaxes that gate so the
bundled runtime can serve the stubs.

Activate by constructing the worker environment as:

    PYTHONPATH=/root/repo/tools/pyshims:/usr/lib/google-cloud-sdk/platform/google_appengine

(tools/ab_fsm_bench.py does this) — nothing outside that PYTHONPATH is
affected, no package is installed, and production deployments with a
real protobuf runtime never load this file.
"""

try:
    from google.protobuf import runtime_version as _rv

    def _tolerant_validate(domain, major, minor, patch, suffix, location):
        # keep the real guarantee that MAJOR versions must match; allow
        # the one-minor-version gap between the SDK runtime (6.32) and
        # pyspark's gencode (6.33)
        if major != _rv.MAJOR:
            _rv._ReportVersionError(
                f"protobuf major version mismatch at {location}: "
                f"gencode {major}.{minor}.{patch} runtime {_rv.MAJOR}.{_rv.MINOR}"
            )

    _rv.ValidateProtobufRuntimeVersion = _tolerant_validate
except Exception:  # pragma: no cover — no protobuf on path: nothing to shim
    pass
