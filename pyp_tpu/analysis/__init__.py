"""Analysis: particle scores/cleaning, class occupancies, trajectory fits, plots."""
