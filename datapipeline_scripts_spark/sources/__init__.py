"""Source/sink connectors (format dispatch = the reference's engine
dispatch, SURVEY §2.A A6)."""
