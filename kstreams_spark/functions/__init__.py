from kstreams_spark.functions.sensor import (
    dual_format_reading,
    parse_sensor_json,
    temperature_alerts,
)

__all__ = ["dual_format_reading", "parse_sensor_json", "temperature_alerts"]
