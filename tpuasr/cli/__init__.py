"""CLI entry points keeping the reference's public shape (SURVEY.md L3:
``python batch_train.py <model> [flags]``, ``python predict.py <model> wav...``,
``python test.py <model>``)."""
