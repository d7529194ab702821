"""pdf_parse_new_ray — Ray-Data-native text/media extraction engine.

A from-scratch reimplementation of simonegosetto/pdf-parse-new's extraction
semantics as a streaming Ray Data pipeline over interleaved text+media
document tables (see SURVEY.md / BASELINE.json north_rule).
"""

__version__ = "0.1.0"
