"""Block-sparse matrix formats (pytree-registered operators)."""
