// Upload page: toggle GenAI options, show progress note on submit.
(function () {
  var toggle = document.getElementById('genai-toggle');
  var opts = document.getElementById('genai-options');
  var form = document.getElementById('run-form');
  var btn = document.getElementById('run-btn');
  var note = document.getElementById('run-note');
  if (toggle && opts) {
    toggle.addEventListener('change', function () {
      opts.hidden = !toggle.checked;
    });
  }
  if (form && btn && note) {
    form.addEventListener('submit', function () {
      btn.disabled = true;
      btn.textContent = 'Running…';
      note.hidden = false;
    });
  }
  // back/bfcache navigation restores the page with stale state — reset
  window.addEventListener('pageshow', function () {
    if (btn && note) {
      btn.disabled = false;
      btn.textContent = 'Run QA pipeline';
      note.hidden = true;
    }
    if (toggle && opts) opts.hidden = !toggle.checked;
  });
})();
