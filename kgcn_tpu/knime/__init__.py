"""KNIME GCN-K node support: the Python helper scripts every Java node
shells out to (reference: /root/reference/KNIME/GCN-K/py/*.py) plus the
plugin-source generator (KNIME/plugin_gen.py)."""
