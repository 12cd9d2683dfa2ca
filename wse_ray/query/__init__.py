"""Ray-Data-native web search engine (see SURVEY.md)."""
