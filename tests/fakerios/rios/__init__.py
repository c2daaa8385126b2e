"""
Minimal in-repo stand-in for the RIOS package, used ONLY by the test
suite to exercise the real calcPerSegmentStatsRIOS /
calcPerSegmentSpatialStatsRIOS applier drivers without RIOS installed.
Implements just the applier / ratapplier surface those drivers touch,
with the same block-iteration semantics (row-major windows of
controls.windowSize).
"""
