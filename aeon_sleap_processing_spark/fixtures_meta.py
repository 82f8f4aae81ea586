"""Shared geometry constants for the committed combine fixture.

Single source of truth consumed by BOTH the fixture generator
(tools/make_fixtures.py) and the driver query + oracle (__spark_entry__.py
q_combine_ticks) — hand-duplicating these invites silent drift: regenerating
the fixture after changing the grid or homography here keeps the query, the
oracle, and the data in lockstep automatically.
"""

COMBINE_T0_US = 1_704_070_800_000_000  # 2024-01-01 01:00:00 UTC
COMBINE_FPS = 50.0
COMBINE_PERIOD_US = 20_000
COMBINE_TOL_US = 5_000
COMBINE_N_TICKS = 2_000
# mildly projective quad→top homography (w varies with x)
COMBINE_H = [[1.01, 0.02, 10.0], [0.01, 0.99, -5.0], [0.00001, 0.0, 1.0]]
