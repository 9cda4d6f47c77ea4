"""Source/envelope operators (SURVEY.md §2.1)."""
