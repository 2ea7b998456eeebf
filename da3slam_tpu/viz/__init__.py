"""Visualisation: live viser SLAM viewer + confidence-map figures."""
