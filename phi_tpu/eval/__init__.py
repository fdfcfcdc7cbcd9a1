from phi_tpu.eval.edits import edit_stats  # noqa: F401
from phi_tpu.eval.scrape import scrape_log  # noqa: F401
