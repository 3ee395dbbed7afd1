"""Source/sink connectors re-expressing the reference's scan surface
(SURVEY.md §2.1, S1-S11) Spark-natively."""
