from . import mailer, moodle  # noqa: F401
