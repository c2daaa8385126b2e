# Sphinx configuration for pyshepseg_tpu
project = 'pyshepseg_tpu'
author = 'pyshepseg_tpu developers'
extensions = ['sphinx.ext.autodoc', 'sphinx.ext.napoleon',
              'sphinx.ext.viewcode']
html_theme = 'alabaster'
autodoc_mock_imports = ['jax', 'jaxlib', 'osgeo', 'boto3']
