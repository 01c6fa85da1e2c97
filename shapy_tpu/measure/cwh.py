"""Chest/waist/hips-only measurement module.

Behavioural spec: reference ``mesh-mesh-intersection/body_measurements/
cwh_measurements.py:38-150`` — the circumference-only variant of
BodyMeasurements used when height/mass supervision is absent.
"""

from __future__ import annotations

from typing import Dict

from shapy_tpu.measure.measurements import BodyMeasurements


class ChestWaistHipsMeasurements(BodyMeasurements):
    def forward(self, triangles, **kwargs) -> Dict:
        return {
            "measurements": self.compute_peripheries(
                triangles,
                compute_chest=kwargs.get("compute_chest", True),
                compute_waist=kwargs.get("compute_waist", True),
                compute_hips=kwargs.get("compute_hips", True),
            )
        }
