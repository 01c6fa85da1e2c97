from shapy_tpu.measure.measurements import (  # noqa: F401
    BodyMeasurements,
    MeasurementAnchors,
    DENSITY,
)
