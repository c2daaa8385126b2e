"""
Command-line entry points (reference: pyshepseg/cmdline/): run_seg,
tiling, subset, runtests, variograms, and the remote segmentation worker.
"""
