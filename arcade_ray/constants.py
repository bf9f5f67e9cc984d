"""Named constants of the engine.

Thresholds carried over from the reference's adaptive codec-selection
heuristics (madgik/arcade), cited per SURVEY.md §2.2 / §6:

- ``BLOCK_ROWS``            — reference block size (src/arcade.h:25).
- ``PLAIN_DISTINCT_RATIO``  — distinct/rows above which no dictionary is
  built (src/writer.cpp:63).
- ``DICT_RESET_RATIO``      — new-distincts/distincts above which the
  shared (differential) dictionary is abandoned for a chunk-local one
  (src/writer.cpp:117).
- ``DICT_MEMORY_BUDGET``    — byte cap on shared-dictionary state per
  encode scope, forcing a local-dict epoch reset
  (CACHE_SIZE = 8192000*2, src/writer.cpp:52).

Everything else is ours (Ray-Data-native design, SURVEY.md §7).
"""

# --- reference-derived (normative) -----------------------------------------
BLOCK_ROWS = 65_535
PLAIN_DISTINCT_RATIO = 0.80
DICT_RESET_RATIO = 0.99
DICT_MEMORY_BUDGET = 16_384_000

# --- ours -------------------------------------------------------------------
# Magic for the encoded per-partition segment file ("ARCade on Ray").
MAGIC = b"ARCR1\n"
FORMAT_VERSION = 1

# Partition sizing: cap an encode partition by token count (list payload),
# not rows — bounds encoder-task memory and the encode-straggler tail
# (SURVEY.md §7.3 item 5). 8M tokens ≈ 32 MB of raw int32 payload.
DEFAULT_PART_TOKEN_CAP = 8_000_000
# Fallback row cap for tables without a token/list column.
DEFAULT_PART_ROW_CAP = 2_000_000

# Sample budget (bytes) for sample-based codec size estimation (FSST, GP).
ESTIMATE_SAMPLE_BYTES = 1 << 16

# FSST: up to 255 symbols of <= 8 bytes, code 255 = escape (VLDB 2020).
FSST_MAX_SYMBOLS = 255
FSST_MAX_SYMBOL_LEN = 8
FSST_ESCAPE = 255
FSST_GENERATIONS = 5
FSST_SAMPLE_BYTES = 1 << 15
