"""Pure-Python semantic core (no Spark imports allowed here).

Reference parity: every public function reproduces the observable behaviour
of the reference implementation (cited per-function as /root/reference
file:line) including its quirks, because the engine's correctness contract is
byte-identical extracted text / field values per url.
"""

from .textdist import edit_distance, accuracy, edit_distance_many
from .tokenspan import split_with_spans, snap_to_grid, fuzzy_key_pattern
from .repair import repair_to_letters, repair_to_digits, repair_no_number
from .matching import match_keys_in_line, match_line_regex
from .sweep import sweep_document, blend_parsers
