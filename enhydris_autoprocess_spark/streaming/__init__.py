from .rollup_stream import streaming_rollup, run_available_now  # noqa: F401
