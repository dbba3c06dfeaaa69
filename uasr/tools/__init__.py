"""Data-preparation and maintenance tools (the reference's prep scripts,
SURVEY.md §2.2 "Data-prep scripts"): utterance-list building, vocab
building, n-gram table dumps, CMVN statistics, feature-cache writing."""
