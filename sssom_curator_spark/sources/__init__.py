"""Sources: synthetic Common-Crawl-style pages, seeded SSSOM fixtures, label dims."""
