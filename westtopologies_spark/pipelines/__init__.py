"""The three reference topologies assembled from the operator library
(SURVEY.md §3.3): role_analysis, lod_explorer, location_topic_model."""
