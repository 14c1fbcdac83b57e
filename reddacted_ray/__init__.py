"""reddacted_ray — Ray-Data-native quality-filter engine (see SURVEY.md)."""
