from .gsod import run_gsod_pipeline, weather_fixture  # noqa: F401
