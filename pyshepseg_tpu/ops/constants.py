"""
Shared constants and dtypes for the segmentation engine.

Matches the reference conventions (reference: pyshepseg/shepseg.py:97-101):
segment IDs are uint32, 0 is the null segment, real IDs start at 1.
"""

import numpy as np

# dtype used for segment ID numbers
SegIdType = np.uint32

# Null value used in both cluster-ID and segment-ID images
SEGNULLVAL = 0
MINSEGID = SEGNULLVAL + 1
