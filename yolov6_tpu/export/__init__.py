"""Export backends: StableHLO (models/end2end.py) and dependency-free ONNX
(export/onnx_export.py) — the reference's primary deploy interchange
(reference: deploy/ONNX/export_onnx.py)."""
