"""Pipeline stages: transcript synthesis, triple extraction, entity linking,
connected-components canonicalization, manifest/resume, end-to-end job."""
