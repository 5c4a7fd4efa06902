"""Pipeline B — "Send": canonical mail users → rendered messages.

Declarative re-expression of the reference's per-row template rendering
(app.py:342–359 via string.Template, SURVEY.md §2.4 F-str12): the four
templates (subject / preheader / plain / HTML) are compiled ONCE on the
driver into concat Column expressions and render JVM-side for every row —
no Python in the hot path, no per-row Template.substitute.

Template documents below are this engine's own (the reference's Spanish
credential-mail wording is a behavior spec, not copied text): same hole
set — $nombre $usuario $contrasena $aula_url $nombre_curso — and the same
subject/preheader/plain/html quartet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import templates

SUBJECT_TEMPLATE = "Tus credenciales — Aula $nombre_curso"

PREHEADER_TEMPLATE = "Acceso al aula virtual. Usuario: $usuario."

PLAIN_TEMPLATE = """Hola $nombre,

Tu cuenta para el curso $nombre_curso ya esta creada.

  Usuario: $usuario
  Contrasena: $contrasena

Ingresa en: $aula_url

Si tienes problemas para entrar, responde este correo.
"""

HTML_TEMPLATE = """<!DOCTYPE html>
<html lang="es"><head><meta charset="UTF-8"></head>
<body style="font-family:sans-serif;margin:0;padding:16px">
  <span style="display:none">$preheader</span>
  <h2>Hola $nombre</h2>
  <p>Tu cuenta para el curso <b>$nombre_curso</b> ya esta creada.</p>
  <table style="border-collapse:collapse">
    <tr><td style="padding:4px 8px">Usuario</td><td style="padding:4px 8px"><code>$usuario</code></td></tr>
    <tr><td style="padding:4px 8px">Contrasena</td><td style="padding:4px 8px"><code>$contrasena</code></td></tr>
  </table>
  <p><a href="$aula_url">Entrar al aula virtual</a></p>
</body></html>
"""


def _bindings(course_name: str, aula_url: str) -> dict[str, Column]:
    return {
        "nombre": F.col("nombre"),
        "usuario": F.col("usuario"),
        "contrasena": F.col("contrasena"),
        "nombre_curso": F.lit(course_name),
        "aula_url": F.lit(aula_url),
    }


def render_messages(
    users: DataFrame, course_name: str, aula_url: str
) -> DataFrame:
    """users(email, nombre, usuario, contrasena) → + subject, preheader,
    plain, html columns (reference app.py:342–359)."""
    b = _bindings(course_name, aula_url)
    preheader = templates.compile_pattern(PREHEADER_TEMPLATE, b, style="template")
    html = templates.compile_pattern(
        HTML_TEMPLATE, {**b, "preheader": preheader}, style="template"
    )
    return users.select(
        "*",
        templates.compile_pattern(SUBJECT_TEMPLATE, b, style="template").alias(
            "subject"
        ),
        preheader.alias("preheader"),
        templates.compile_pattern(PLAIN_TEMPLATE, b, style="template").alias(
            "plain"
        ),
        html.alias("html"),
    )


def sql_render_messages(
    users_sql: str, course_name: str, aula_url: str
) -> str:
    """DuckDB twin of :func:`render_messages` over a users subquery."""
    b = {
        "nombre": "nombre",
        "usuario": "usuario",
        "contrasena": "contrasena",
        "nombre_curso": f"'{course_name}'",
        "aula_url": f"'{aula_url}'",
    }
    preheader = templates.sql_compile_pattern(
        PREHEADER_TEMPLATE, b, style="template"
    )
    html = templates.sql_compile_pattern(
        HTML_TEMPLATE, {**b, "preheader": preheader}, style="template"
    )
    subject = templates.sql_compile_pattern(SUBJECT_TEMPLATE, b, style="template")
    plain = templates.sql_compile_pattern(PLAIN_TEMPLATE, b, style="template")
    return f"""
    SELECT u.*,
           {subject} AS subject,
           {preheader} AS preheader,
           {plain} AS plain,
           {html} AS html
    FROM ({users_sql}) u
    """
