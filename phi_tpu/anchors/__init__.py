from phi_tpu.anchors.join import build_anchor_tables, AnchorTables  # noqa: F401
